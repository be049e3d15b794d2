"""Native C++ library vs JAX implementations (translation solve, raster)."""

import numpy as np
import pytest
import jax.numpy as jnp

from acr_tpu.io import native
from acr_tpu.pipeline.project import estimate_translation_ls
from acr_tpu.viz.raster import render_hands

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_translation_matches_jax(rng):
    f, size = 1265.0, 512
    j3d = rng.randn(21, 3).astype(np.float32) * 0.08
    t = np.array([0.1, -0.2, 2.5], np.float32)
    p = j3d + t
    uv = np.stack([f * p[:, 0] / p[:, 2] + 256,
                   f * p[:, 1] / p[:, 2] + 256], 1).astype(np.float32)
    got_ls = native.estimate_translation(j3d, uv, ransac=False)
    got_ransac = native.estimate_translation(j3d, uv, ransac=True)
    want = np.asarray(estimate_translation_ls(
        jnp.asarray(j3d[None]), jnp.asarray(uv[None]), focal=f))[0]
    np.testing.assert_allclose(got_ls, want, atol=1e-3)
    np.testing.assert_allclose(got_ransac, t, atol=3e-2)


def test_ransac_rejects_outliers(rng):
    f = 1265.0
    j3d = rng.randn(21, 3).astype(np.float32) * 0.08
    t = np.array([0.05, 0.1, 2.0], np.float32)
    p = j3d + t
    uv = np.stack([f * p[:, 0] / p[:, 2] + 256,
                   f * p[:, 1] / p[:, 2] + 256], 1).astype(np.float32)
    uv_bad = uv.copy()
    uv_bad[:3] += 300.0          # gross outliers
    got = native.estimate_translation(j3d, uv_bad, ransac=True)
    np.testing.assert_allclose(got, t, atol=5e-2)
    # plain LS is dragged off by the outliers
    got_ls = native.estimate_translation(j3d, uv_bad, ransac=False)
    assert np.abs(got_ls - t).max() > np.abs(got - t).max()


def test_rasterize_matches_jax_coverage(rng):
    from scipy.spatial import ConvexHull
    pts = rng.randn(200, 3).astype(np.float32) * 0.05
    faces = ConvexHull(pts).simplices.astype(np.int32)
    verts_cam = pts + np.array([0, 0, 1.0], np.float32)
    # hand-0 color, to match render_hands' PRE_COLORS on the JAX side
    from acr_tpu.viz.raster import PRE_COLORS
    colors = np.tile(PRE_COLORS[0][None], (len(faces), 1))

    got = native.rasterize(verts_cam, faces, colors, size=128, focal=200.0)
    assert got.shape == (128, 128, 4)
    cover_native = got[..., 3] > 0

    # JAX rasterizer on the same geometry (as hand slot 0)
    nf = len(faces)
    faces2 = np.zeros((2, nf, 3), np.int32)
    faces2[0] = faces
    verts2 = np.zeros((2, len(pts), 3), np.float32)
    verts2[0] = pts
    rgba = np.asarray(render_hands(
        jnp.asarray(verts2), jnp.asarray(np.array([[0, 0, 1.0], [0, 0, 1.0]],
                                                  np.float32)),
        jnp.asarray([True, False]), jnp.asarray(faces2),
        size=128, focal=200.0))
    cover_jax = rgba[..., 3] > 0
    # coverage agrees except at triangle-edge pixels
    disagree = (cover_native != cover_jax).sum()
    assert disagree < 0.02 * cover_jax.sum() + 20
    # shading agrees closely where both covered
    both = cover_native & cover_jax
    diff = np.abs(got[..., 0][both] - rgba[..., 0][both])
    assert np.percentile(diff, 95) < 0.05


def test_degenerate_input():
    with pytest.raises(ValueError):
        native.estimate_translation(np.zeros((4, 3), np.float32),
                                    np.zeros((4, 2), np.float32),
                                    ransac=False)
