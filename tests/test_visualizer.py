"""Visualizer tests: compositing, paste-back, aux views, 3D skeleton grid."""

import numpy as np
import pytest
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.viz.skeleton3d import BONES_21, Plotter3dPoses
from acr_tpu.viz.visualizer import MANO2INTERHAND, Visualizer, hand_skeleton


@pytest.fixture
def viz():
    faces = np.random.RandomState(0).randint(0, 778, (2, 1538, 3)).astype(np.int32)
    return Visualizer(Config(render_size=64), faces)


def test_hand_skeleton_structure():
    sk = hand_skeleton()
    assert len(sk) == 21
    assert sk[20]["name"] == "wrist" and sk[20]["parent_id"] == -1
    # tip joints parent toward base; base joints parent to wrist
    assert sk[0]["parent_id"] == 1
    assert sk[3]["parent_id"] == 20
    assert len(MANO2INTERHAND) == 21 and sorted(MANO2INTERHAND) == list(range(21))


def test_composite_blend(viz, rng):
    rgba = np.zeros((64, 64, 4), np.float32)
    rgba[10:20, 10:20] = [1.0, 0.0, 0.0, 1.0]
    inp = np.full((64, 64, 3), 100, np.uint8)
    out = viz.composite(rgba, inp)
    # covered region: 0.9*255 + 0.1*100 = 239.5 red
    assert abs(int(out[15, 15, 0]) - 239) <= 1
    assert out[15, 15, 1] == 10
    np.testing.assert_array_equal(out[40, 40], [100, 100, 100])


def test_paste_back_roundtrip(viz, rng):
    # frame 100x60 -> padded 100x100 (pad left/right 20) -> rendered 64x64
    frame = (rng.rand(100, 60, 3) * 255).astype(np.uint8)
    offsets = np.array([100, 100, 0, 0, 0, 0, 0, 20, 0, 20], np.float32)
    rendered = np.full((64, 64, 3), 50, np.uint8)
    out = viz.paste_back(rendered, frame, offsets)
    assert out.shape == frame.shape
    # interior pixels replaced by the resized render
    assert (np.abs(out[50, 30].astype(int) - 50) <= 2).all()


def test_aux_views(viz, rng):
    out = {
        "detection_flag": jnp.asarray([[True, True]]),
        "pj2d": jnp.asarray(rng.rand(1, 2, 21, 2).astype(np.float32) * 2 - 1),
        "j3d": jnp.asarray(rng.randn(1, 2, 21, 3).astype(np.float32) * 0.1),
        "l_center_map": jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32)),
        "r_center_map": jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32)),
    }
    meta = {"image": (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)}
    views = viz.aux_views(out, meta, ["org_img", "pj2d", "centermap", "j3d"])
    assert set(views) == {"org_img", "pj2d", "centermap", "j3d"}
    assert views["pj2d"].shape == (64, 64, 3)
    assert views["centermap"].shape == (64, 128, 3)   # l & r side by side
    assert views["j3d"].shape == (64, 64, 3)


def test_plotter3d_draws():
    joints = np.random.RandomState(0).randn(21, 3).astype(np.float32) * 0.2
    plot = Plotter3dPoses(canvas_size=(128, 128), scale=60)
    img = plot.encircle_plot([joints], [(255, 0, 0)])
    assert img.shape == (128, 128, 3)
    assert (img != 255).any()        # something drawn
    single = plot.plot([joints])
    assert (single != 255).any()
    assert len(BONES_21) == 20       # 21-joint tree has 20 bones
