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


# ---------------------------------------------------------------- r4 advice
def test_pack_outputs_planar_flag_explicit():
    """pack_outputs takes the _rgba layout as an explicit flag (ADVICE
    r4): a planar (…, 4, H, W) image packs/unpacks identically to its
    channel-minor twin, and a mismatched flag fails loudly instead of
    silently misrouting."""
    from acr_tpu.pipeline.app import pack_outputs, unpack_outputs
    rgba_hwc = np.linspace(0, 1, 4 * 8 * 8, dtype=np.float32
                           ).reshape(8, 8, 4)
    rgba_planar = np.moveaxis(rgba_hwc, -1, 0)
    spec_a, spec_b = [], []
    a = unpack_outputs(
        pack_outputs({"_rgba": jnp.asarray(rgba_hwc), "x": jnp.ones(3)},
                     spec_a, planar_rgba=False), spec_a)
    b = unpack_outputs(
        pack_outputs({"_rgba": jnp.asarray(rgba_planar), "x": jnp.ones(3)},
                     spec_b, planar_rgba=True), spec_b)
    np.testing.assert_array_equal(a["_rgba"], b["_rgba"])
    np.testing.assert_array_equal(a["x"], b["x"])
    with pytest.raises(AssertionError):      # wrong flag for the layout
        pack_outputs({"_rgba": jnp.asarray(np.zeros((8, 8, 3)))},
                     [], planar_rgba=True)


def test_shade_from_attrs_rejects_stacked_bary():
    """A stacked (H, W, 3) bary array (the pre-round-4 calling
    convention) must fail loudly, not index pixel rows (ADVICE r4)."""
    from acr_tpu.viz.raster import shade_from_attrs
    fid = jnp.zeros((8, 8), jnp.int32)
    attrs = jnp.zeros((12, 8, 8), jnp.float32)
    with pytest.raises(AssertionError):
        shade_from_attrs(fid, jnp.zeros((8, 8, 3)), attrs)
    # the tuple-of-planes contract still works
    bary = (jnp.ones((8, 8)) / 3,) * 3
    out = shade_from_attrs(fid, bary, attrs)
    assert out.shape == (8, 8, 4)


def test_profile_stream_shares_bench_scaffolding():
    """tools/profile_stream must drive the bench's PUBLIC scaffolding
    (ADVICE r4): a signature drift in bench.stream_step_setup breaks
    this test instead of silently breaking the profiler."""
    import inspect

    import bench
    import tools.profile_stream as ps

    sig = inspect.signature(bench.stream_step_setup)
    assert list(sig.parameters) == ["precision", "quantize", "render_size"]
    # the profiler's capture path references the shared helper
    assert "stream_step_setup" in inspect.getsource(ps.capture)
    # and the helper's contract holds end-to-end on the CPU backend
    # (app construction only -- nothing jitted/compiled here)
    app, step, state, uploads, force = bench.stream_step_setup()
    assert callable(step) and callable(force) and callable(uploads)
    img_d, off_d = uploads(1)[0]
    assert img_d.shape == (1, 512, 512 * 3) and off_d.shape == (1, 10)
