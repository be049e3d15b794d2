"""Data-parallel pipeline over the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.models.acr import ACRNet
from acr_tpu.parallel.mesh import batch_sharding, make_mesh
from acr_tpu.pipeline.infer import ACRPipeline

MANO_DIR = os.path.join(os.path.dirname(__file__), "..", "model_data", "mano")

needs_devices = pytest.mark.skipif(len(jax.devices()) < 4,
                                   reason="needs >=4 virtual devices")


def small_params():
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))
    return jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)


def test_make_mesh():
    mesh = make_mesh(4)
    assert mesh.shape == {"data": 4}
    with pytest.raises(ValueError):
        make_mesh(10 ** 6)


@needs_devices
def test_data_parallel_matches_single_device(rng):
    params = small_params()
    imgs = (rng.rand(4, 128, 128, 3) * 255).astype(np.uint8)
    offsets = np.tile(np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]],
                               np.float32), (4, 1))

    cfg1 = Config(input_size=128, mano_model_path=MANO_DIR, data_parallel=1)
    cfg4 = Config(input_size=128, mano_model_path=MANO_DIR, data_parallel=4)
    out1 = ACRPipeline(cfg1, params=params)(imgs, offsets)
    out4 = ACRPipeline(cfg4, params=params)(imgs, offsets)

    np.testing.assert_allclose(np.asarray(out4["verts"]),
                               np.asarray(out1["verts"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out4["pj2d_org"]),
                               np.asarray(out1["pj2d_org"]), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out4["detection_flag"]),
                                  np.asarray(out1["detection_flag"]))


@needs_devices
def test_sharded_batch_layout(rng):
    params = small_params()
    cfg = Config(input_size=128, mano_model_path=MANO_DIR, data_parallel=4)
    pipe = ACRPipeline(cfg, params=params)
    imgs = (rng.rand(8, 128, 128, 3) * 255).astype(np.uint8)
    offsets = np.tile(np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]],
                               np.float32), (8, 1))
    out = pipe(imgs, offsets)
    assert out["verts"].shape == (8, 2, 778, 3)
