"""Pallas rasterizer vs the lax.scan rasterizer (interpret mode on CPU).

Natively validated on TPU: bit-identical face selection and a ~14x
speedup (306 -> 22 ms/frame at 512px, docs/PERFORMANCE.md).
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial import ConvexHull

from acr_tpu.viz.raster import _project, rasterize, render_hands
from acr_tpu.viz.raster_pallas import FACE_CHUNK, rasterize_pallas


def make_geometry(rng, n_pts=300, z=1.0):
    pts = rng.randn(n_pts, 3).astype(np.float32) * 0.05
    faces = ConvexHull(pts).simplices.astype(np.int32)
    pad = (-len(faces)) % FACE_CHUNK
    faces = np.concatenate([faces, np.zeros((pad, 3), np.int32)])
    screen = _project(jnp.asarray(pts + np.array([0, 0, z], np.float32)),
                      200.0, 64.0, 64.0)
    return screen, jnp.asarray(faces)


def test_matches_scan_rasterizer(rng):
    screen, faces = make_geometry(rng)
    fid0, bary0 = rasterize(screen, faces, 128, 128)
    fid1, bary1 = rasterize_pallas(screen, faces, 128, 128, interpret=True)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))
    np.testing.assert_allclose(np.asarray(bary0), np.asarray(bary1), atol=1e-5)


def test_multiple_column_tiles(rng):
    # width 512 -> two 256-wide column tiles; tile seams must be invisible
    screen, faces = make_geometry(rng)
    screen = screen.at[:, 0].mul(4.0)      # spread across the full width
    fid0, _ = rasterize(screen, faces, 64, 512)
    fid1, _ = rasterize_pallas(screen, faces, 64, 512, interpret=True)
    np.testing.assert_array_equal(np.asarray(fid0), np.asarray(fid1))


def test_empty_scene():
    screen = jnp.zeros((3, 3))
    faces = jnp.zeros((FACE_CHUNK, 3), jnp.int32)     # all degenerate
    fid, bary = rasterize_pallas(screen, faces, 64, 128, interpret=True)
    assert (np.asarray(fid) == -1).all()
    assert (np.asarray(bary) == 0).all()


def test_render_hands_scan_backend_unchanged(rng):
    # the 'scan' backend remains selectable and is what CPU 'auto' uses
    verts = jnp.asarray(rng.randn(2, 778, 3).astype(np.float32) * 0.03)
    faces = jnp.asarray(rng.randint(0, 778, (2, 1538, 3)).astype(np.int32))
    trans = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0]], jnp.float32)
    det = jnp.asarray([True, True])
    a = render_hands(verts, trans, det, faces, size=128, focal=200.0,
                     backend="scan")
    b = render_hands(verts, trans, det, faces, size=128, focal=200.0,
                     backend="auto")      # cpu -> scan
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
