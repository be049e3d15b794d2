"""Regression tests for review findings (config, capture, DP padding, names)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.config import Config, make_config, parse_args

MANO_DIR = os.path.join(os.path.dirname(__file__), "..", "model_data", "mano")


def test_missing_explicit_yaml_raises():
    with pytest.raises(FileNotFoundError):
        parse_args(["--configs_yml", "/nonexistent/demo.ymll"])


def test_scalar_yaml_tuple_coerced(tmp_path):
    yml = tmp_path / "c.yml"
    yml.write_text("ARGS:\n show_items: pj2d\n kernel_sizes: 5\n")
    cfg = make_config(str(yml))
    assert cfg.show_items == ("pj2d",)
    assert cfg.kernel_sizes == (5,)


def test_output_name_collision_suffixed(tmp_path):
    from acr_tpu.pipeline.app import ACRApp
    app = ACRApp.__new__(ACRApp)            # name logic only, no pipeline
    assert app._output_name("/a/0001.jpg") == "0001.jpg"
    assert app._output_name("/b/0001.jpg") == "0001_1.jpg"
    assert app._output_name("/a/0001.jpg") == "0001.jpg"   # stable per path


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_data_parallel_pads_odd_batches(rng):
    from acr_tpu.models.acr import ACRNet
    from acr_tpu.pipeline.infer import ACRPipeline
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    cfg = Config(input_size=128, mano_model_path=MANO_DIR, data_parallel=4,
                 configs_yml="")
    pipe = ACRPipeline(cfg, params=params)
    for batch in (1, 3):                     # not divisible by 4
        imgs = (rng.rand(batch, 128, 128, 3) * 255).astype(np.uint8)
        offs = np.tile(np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]],
                                np.float32), (batch, 1))
        out = pipe(imgs, offs)
        assert out["verts"].shape == (batch, 2, 778, 3)


def test_webcam_stream_rejects_missing_camera():
    from acr_tpu.pipeline.capture import WebcamVideoStream
    with pytest.raises(RuntimeError):
        WebcamVideoStream(src=99)
