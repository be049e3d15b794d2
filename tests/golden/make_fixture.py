#!/usr/bin/env python
"""Regenerate tests/golden/e2e_fixture.npz (run from the repo root).

Only regenerate after an INTENTIONAL numerical-contract change; the
fixture pins the full pipeline (backbone -> parser -> MANO ->
projection) against silent drift.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.models.acr import ACRNet
from acr_tpu.pipeline.infer import ACRPipeline

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    cfg = Config(input_size=128, configs_yml="",
                 mano_model_path=os.path.join(HERE, "..", "..", "model_data",
                                              "mano"))
    pipe = ACRPipeline(cfg, params=params)
    rng = np.random.RandomState(42)
    img = (rng.rand(1, 128, 128, 3) * 255).astype(np.uint8)
    off = np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32)
    out = pipe(img, off)
    save = {k: np.asarray(v) for k, v in out.items()
            if k in ("verts", "j3d", "pj2d", "cam", "poses", "betas",
                     "centers", "cam_trans")}
    save["detection_flag"] = np.asarray(out["detection_flag"])
    np.savez(os.path.join(HERE, "e2e_fixture.npz"), **save)
    print("fixture regenerated:", sorted(save))


if __name__ == "__main__":
    main()
