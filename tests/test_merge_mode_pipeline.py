"""prior_mode='merge' through the full pipeline (checkpoint-surface parity)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.models.acr import ACRNet
from acr_tpu.pipeline.infer import ACRPipeline

MANO_DIR = os.path.join(os.path.dirname(__file__), "..", "model_data", "mano")


def test_merge_mode_forward(rng):
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    # inject the converted fusion head where ACRPipeline expects it
    params["params"]["parser"] = {"fusion_fc": {
        "kernel": jnp.asarray(rng.randn(424, 212).astype(np.float32) * 0.01),
        "bias": jnp.asarray(rng.randn(212).astype(np.float32)),
    }}
    cfg = Config(input_size=128, mano_model_path=MANO_DIR, prior_mode="merge")
    pipe = ACRPipeline(cfg, params=params)
    assert pipe.merge_params is not None
    # popped from the pipeline's (transformed) net tree; the caller's
    # dict is left untouched since the s2d transform deep-copies
    assert "parser" not in pipe.params["params"]

    img = (rng.rand(1, 128, 128, 3) * 255).astype(np.uint8)
    offsets = np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32)
    out = pipe(img, offsets)
    assert np.isfinite(np.asarray(out["verts"])).all()
