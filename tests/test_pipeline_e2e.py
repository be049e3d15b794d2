"""End-to-end pipeline test: uint8 frame -> verts/joints/pj2d (CPU backend).

Runs the full jitted chain at reduced resolution (128px) with random
synthetic weights — exercising backbone, heads, parser, MANO,
projection, and the translation solve in one program.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.models.acr import ACRNet
from acr_tpu.pipeline.infer import ACRPipeline
from acr_tpu.pipeline.preprocess import img_preprocess

MANO_DIR = os.path.join(os.path.dirname(__file__), "..", "model_data", "mano")


@pytest.fixture(scope="module")
def pipeline():
    cfg = Config(input_size=128, mano_model_path=MANO_DIR,
                 centermap_conf_thresh=0.35)
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))
    # damp BN scales as the synthetic-checkpoint tool does, so the
    # 1.1^x camera scale stays finite with random weights
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    return ACRPipeline(cfg, params=params)


@pytest.fixture(scope="module")
def result(pipeline, rng):
    bgr = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    meta = img_preprocess(bgr, "frame.jpg", input_size=128)
    return pipeline(meta["image"], meta["offsets"])


def test_output_shapes(result):
    assert result["verts"].shape == (1, 2, 778, 3)
    assert result["j3d"].shape == (1, 2, 21, 3)
    assert result["pj2d"].shape == (1, 2, 21, 2)
    assert result["pj2d_org"].shape == (1, 2, 21, 2)
    assert result["cam_trans"].shape == (1, 2, 3)
    assert result["poses"].shape == (1, 2, 48)
    assert result["betas"].shape == (1, 2, 10)
    assert result["cam"].shape == (1, 2, 3)
    assert result["detection_flag"].shape == (1, 2)
    assert result["detection_flag"].dtype == jnp.bool_


def test_outputs_finite(result):
    for key in ("verts", "j3d", "pj2d", "pj2d_org", "cam_trans", "poses",
                "betas", "cam"):
        assert np.isfinite(np.asarray(result[key])).all(), key


def test_root_alignment_in_pipeline(result):
    # align_idx=9 -> joint 9 of each hand at origin
    j9 = np.asarray(result["j3d"])[:, :, 9]
    np.testing.assert_allclose(j9, np.zeros_like(j9), atol=1e-5)


def test_cam_scale_positive(result):
    # channel 0 of cam went through 1.1^x then the fuse conv; the raw
    # 109-vector's first channel is the fused cam — no sign guarantee —
    # but the *global* head output fed into fusion was positive.
    assert np.isfinite(np.asarray(result["cam"])).all()


def test_batched_forward(pipeline, rng):
    imgs = (rng.rand(2, 128, 128, 3) * 255).astype(np.uint8)
    offsets = np.tile(np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]],
                               np.float32), (2, 1))
    out = pipeline(imgs, offsets)
    assert out["verts"].shape == (2, 2, 778, 3)


def test_refine_after_smoothing(pipeline, result, rng):
    out = pipeline.refine(result["poses"], result["betas"], result["cam"],
                          np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]],
                                   np.float32))
    np.testing.assert_allclose(np.asarray(out["verts"]),
                               np.asarray(result["verts"]), atol=1e-5)
