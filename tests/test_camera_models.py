"""Camera-model parity for the renderer.

The reference offers three projections: pyrender IntrinsicsCamera
(renderer_pyrd.py:20-47) and the pytorch3d FoVPerspective /
FoVOrthographic pair selected by ``perspective_proj``
(renderer_pt3d.py:74-110). These tests pin the TPU renderer's
equivalents: 'fov' must reduce to the pinhole at the matched focal,
'ortho' must place geometry by parallel projection, and the Visualizer
must resolve ``camera_model='pt3d'`` by the reference's rule.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.viz.raster import fov_focal_px, render_hands

SIZE = 128


def _two_quads(center_x=0.0, center_y=0.0, z=5.0, half=0.4):
    """Two 'hands', each a quad of 2 triangles facing the camera."""
    quad = np.array([[-half, -half, 0], [half, -half, 0],
                     [half, half, 0], [-half, half, 0]], np.float32)
    quad = quad + np.array([center_x, center_y, z], np.float32)
    verts = np.stack([quad, quad + np.array([0, 0, 1], np.float32)])
    faces = np.tile(np.array([[0, 1, 2], [0, 2, 3]], np.int32), (2, 1, 1))
    return jnp.asarray(verts), jnp.asarray(faces)


def _render(camera, fov_deg=22.5, focal=160.0, center=(0.0, 0.0)):
    verts, faces = _two_quads(*center)
    rgba = render_hands(verts, jnp.zeros((2, 3)),
                        jnp.array([True, True]), faces,
                        size=SIZE, focal=focal, backend="scan",
                        camera=camera, fov_deg=fov_deg)
    return np.asarray(rgba)


def test_fov_matches_intrinsics_at_matched_focal():
    focal = 160.0
    fov = float(np.degrees(2 * np.arctan((SIZE / 2.0) / focal)))
    assert fov_focal_px(fov, SIZE) == pytest.approx(focal, rel=1e-6)
    a = _render("intrinsics", focal=focal)
    b = _render("fov", fov_deg=fov, focal=999.0)   # focal must be ignored
    np.testing.assert_array_equal(a, b)


def test_fov_angle_changes_scale():
    wide = _render("fov", fov_deg=60.0)
    narrow = _render("fov", fov_deg=20.0)
    # narrower FoV = longer focal = bigger footprint on screen
    assert narrow[..., 3].sum() > wide[..., 3].sum() * 1.5


def test_ortho_places_by_parallel_projection():
    # quad centered at x=0.5 -> u = 64 + 64*0.5 = 96 regardless of z
    rgba = _render("ortho", center=(0.5, 0.0))
    ys, xs = np.nonzero(rgba[..., 3] > 0)
    assert xs.mean() == pytest.approx(96.0, abs=1.5)
    assert ys.mean() == pytest.approx(64.0, abs=1.5)
    # perspective at focal 160, z=5: u = 64 + 160*0.5/5 = 80 — different
    rgba_p = _render("intrinsics", focal=160.0, center=(0.5, 0.0))
    _, xs_p = np.nonzero(rgba_p[..., 3] > 0)
    assert xs_p.mean() == pytest.approx(80.0, abs=1.5)


def test_ortho_has_no_foreshortening():
    near = _render("ortho", center=(0.0, 0.0))
    far_verts, faces = _two_quads(0.0, 0.0, z=50.0)
    far = np.asarray(render_hands(
        far_verts, jnp.zeros((2, 3)), jnp.array([True, True]), faces,
        size=SIZE, backend="scan", camera="ortho"))
    assert near[..., 3].sum() == far[..., 3].sum()


def test_visualizer_resolves_pt3d_rule():
    from acr_tpu.viz.visualizer import Visualizer
    faces = np.zeros((2, 4, 3), np.int32)
    v = Visualizer(Config(camera_model="pt3d", perspective_proj=True), faces)
    assert v.camera == "fov"
    v = Visualizer(Config(camera_model="pt3d", perspective_proj=False), faces)
    assert v.camera == "ortho"
    v = Visualizer(Config(), faces)
    assert v.camera == "intrinsics"
    with pytest.raises(ValueError, match="intrinsics"):
        Visualizer(Config(camera_model="fov", renderer="native"), faces)
