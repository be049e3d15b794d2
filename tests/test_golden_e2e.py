"""End-to-end regression pin: seed-0 weights + fixed frame -> frozen outputs.

Catches silent numerical drift anywhere in the chain (backbone, parser,
MANO, projection). Regenerate the fixture ONLY for intentional
numerical-contract changes: ``python tests/golden/make_fixture.py``.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.models.acr import ACRNet
from acr_tpu.pipeline.infer import ACRPipeline

HERE = os.path.dirname(__file__)
FIXTURE = os.path.join(HERE, "golden", "e2e_fixture.npz")
MANO_DIR = os.path.join(HERE, "..", "model_data", "mano")


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="no golden fixture")
def test_e2e_outputs_match_golden():
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    cfg = Config(input_size=128, mano_model_path=MANO_DIR, configs_yml="")
    pipe = ACRPipeline(cfg, params=params)
    rng = np.random.RandomState(42)
    img = (rng.rand(1, 128, 128, 3) * 255).astype(np.uint8)
    off = np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32)
    out = pipe(img, off)

    golden = np.load(FIXTURE)
    np.testing.assert_array_equal(np.asarray(out["detection_flag"]),
                                  golden["detection_flag"])
    np.testing.assert_array_equal(np.asarray(out["centers"]), golden["centers"])
    for key, tol in (("poses", 1e-4), ("betas", 1e-4), ("cam", 1e-4),
                     ("verts", 1e-4), ("j3d", 1e-4), ("pj2d", 1e-4)):
        np.testing.assert_allclose(np.asarray(out[key]), golden[key],
                                   atol=tol, err_msg=key)
    # the translation solve is a 3x3 normal-equation solve whose
    # conditioning is poor for synthetic-weight predictions (collapsed
    # pj2d); pin it loosely in relative terms only
    np.testing.assert_allclose(np.asarray(out["cam_trans"]),
                               golden["cam_trans"], rtol=5e-2, atol=0.1,
                               err_msg="cam_trans")
