"""Rasterizer tests: coverage, depth ordering, shading, compositing."""

import numpy as np
import pytest
import jax.numpy as jnp

from acr_tpu.viz.raster import (
    compute_vertex_normals,
    rasterize,
    render_hands,
    shade,
    _project,
)


def pad_faces(faces, chunk=128):
    pad = (-len(faces)) % chunk
    return np.concatenate([faces, np.zeros((pad, 3), faces.dtype)], axis=0)


def test_single_triangle_coverage():
    # big triangle covering the image center
    verts = jnp.asarray([[10.0, 10.0, 1.0], [120.0, 10.0, 1.0],
                         [10.0, 120.0, 1.0]])
    faces = jnp.asarray(pad_faces(np.array([[0, 1, 2]], np.int32)))
    fid, bary = rasterize(verts, faces, 128, 128)
    fid = np.asarray(fid)
    assert fid[20, 20] == 0          # inside
    assert fid[20, 100] == 0         # inside along hypotenuse side? (row 20, col 100)
    assert fid[125, 125] == -1       # outside
    assert fid[5, 5] == -1
    b = np.asarray(bary)[20, 20]
    np.testing.assert_allclose(b.sum(), 1.0, atol=1e-5)
    assert (b >= 0).all()


def test_depth_ordering():
    # two overlapping triangles; nearer one must win
    verts = jnp.asarray([
        [10.0, 10.0, 2.0], [120.0, 10.0, 2.0], [10.0, 120.0, 2.0],   # far
        [10.0, 10.0, 1.0], [120.0, 10.0, 1.0], [10.0, 120.0, 1.0],   # near
    ])
    faces = jnp.asarray(pad_faces(np.array([[0, 1, 2], [3, 4, 5]], np.int32)))
    fid, _ = rasterize(verts, faces, 128, 128)
    assert np.asarray(fid)[30, 30] == 1


def test_degenerate_faces_ignored():
    verts = jnp.asarray([[64.0, 64.0, 1.0]] * 3)
    faces = jnp.asarray(pad_faces(np.array([[0, 0, 0]], np.int32)))
    fid, _ = rasterize(verts, faces, 128, 128)
    assert (np.asarray(fid) == -1).all()


def test_vertex_normals_flat_square():
    verts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    n = np.asarray(compute_vertex_normals(verts, faces))
    np.testing.assert_allclose(np.abs(n[:, 2]), np.ones(4), atol=1e-6)


def test_projection_pinhole():
    v = jnp.asarray([[0.0, 0.0, 2.0], [0.2, -0.1, 2.0]])
    s = np.asarray(_project(v, 1000.0, 256.0, 256.0))
    np.testing.assert_allclose(s[0], [256, 256, 2.0], atol=1e-5)
    np.testing.assert_allclose(s[1], [356, 206, 2.0], atol=1e-4)


def test_render_hands_end_to_end(rng):
    # two crude hand stand-ins: small vertex clouds with hull faces
    from scipy.spatial import ConvexHull
    pts_l = rng.randn(778, 3).astype(np.float32) * 0.03
    pts_r = rng.randn(778, 3).astype(np.float32) * 0.03
    faces_l = ConvexHull(pts_l).simplices.astype(np.int32)
    faces_r = ConvexHull(pts_r).simplices.astype(np.int32)
    nf = 1538
    fl = np.resize(faces_l, (nf, 3))
    fr = np.resize(faces_r, (nf, 3))
    verts = jnp.asarray(np.stack([pts_l, pts_r]))
    faces = jnp.asarray(np.stack([fl, fr]))
    trans = jnp.asarray([[-0.08, 0.0, 1.2], [0.08, 0.0, 1.2]])

    rgba = np.asarray(render_hands(verts, trans,
                                   jnp.asarray([True, True]), faces,
                                   size=128, focal=200.0))
    assert rgba.shape == (128, 128, 4)
    cover = rgba[..., 3] > 0
    assert cover.any(), "nothing rendered"
    # left hand projects left of center, right hand right of center
    ys, xs = np.where(cover)
    assert xs.min() < 64 < xs.max()
    assert (rgba[..., :3] >= 0).all() and (rgba[..., :3] <= 1).all()

    # undetected right hand disappears
    rgba2 = np.asarray(render_hands(verts, trans,
                                    jnp.asarray([True, False]), faces,
                                    size=128, focal=200.0))
    cover2 = rgba2[..., 3] > 0
    ys2, xs2 = np.where(cover2)
    assert xs2.max() <= 64 + 2
    assert cover2.sum() < cover.sum()


def test_shade_lambert_range(rng):
    verts = jnp.asarray([[10.0, 10.0, 1.0], [120.0, 10.0, 1.0],
                         [10.0, 120.0, 1.0]])
    faces = jnp.asarray(pad_faces(np.array([[0, 1, 2]], np.int32)))
    fid, bary = rasterize(verts, faces, 128, 128)
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (3, 1))
    colors = jnp.ones((faces.shape[0], 3))
    img = np.asarray(shade(fid, bary, faces, normals, colors))
    inside = np.asarray(fid) >= 0
    assert (img[inside][:, :3] == 1.0).all()     # fully lit, clipped to 1
    assert (img[~inside][:, 3] == 0).all()
