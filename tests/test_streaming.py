"""Streaming-loop tests with a synthetic frame source (no camera)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.models.acr import ACRNet
from acr_tpu.pipeline.app import ACRApp
from acr_tpu.pipeline.streaming import StreamingLoop, SyntheticSource

MANO_DIR = os.path.join(os.path.dirname(__file__), "..", "model_data", "mano")


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))

    def fix(p, x):
        name = getattr(p[-1], "key", None)
        if name == "scale":
            return x * 0.2
        names = [getattr(q, "key", "") for q in p]
        if len(names) >= 3 and names[-3].endswith("center_head") \
                and names[-2] == "out" and names[-1] == "bias":
            return x + 0.5
        return x
    params = jax.tree_util.tree_map_with_path(fix, params)
    cfg = Config(input_size=128, mano_model_path=MANO_DIR, renderer="tpu",
                 render_size=128, demo_mode="webcam",
                 temporal_optimization=True,
                 output_dir=str(tmp_path_factory.mktemp("stream")) + "/")
    return ACRApp(cfg, params=params)


def test_synthetic_source_exhausts():
    src = SyntheticSource(3)
    frames = [src.read() for _ in range(5)]
    assert sum(f is not None for f in frames) == 3
    assert frames[3] is None


def test_streaming_loop_processes_all_frames(app):
    results = []
    loop = StreamingLoop(app, on_result=lambda img, out: results.append(img))
    n = loop.run(SyntheticSource(5))
    assert n == 5
    assert len(results) == 5
    for img in results:
        assert img.dtype == np.uint8 and img.ndim == 3
    assert loop.p50_latency_ms() > 0
    assert len(loop.latencies) == 5


def test_streaming_loop_max_frames(app):
    loop = StreamingLoop(app, max_frames=2)
    n = loop.run(SyntheticSource(10))
    assert n == 2


def test_stream_pack_roundtrip(app):
    """The packed single-buffer readback reproduces every output (the
    uint8-bitcast rgba to display precision)."""
    from acr_tpu.pipeline.streaming import SyntheticSource
    frame = SyntheticSource(1).read()
    from acr_tpu.pipeline.preprocess import img_preprocess
    meta = img_preprocess(frame, "f", input_size=app.cfg.input_size)
    packed = app.stream_step(meta)
    out = app.unpack_stream(packed)
    assert out["verts"].shape == (1, 2, 778, 3)
    assert out["detection_flag"].dtype == bool
    rgba = out["_rgba"]
    assert rgba.shape[-1] == 4 and rgba.dtype == np.float32
    assert 0.0 <= rgba.min() and rgba.max() <= 1.0
    # the packed floats carry the exact values (rgba to 1/255)
    ref = app.pipeline(meta["image"], meta["offsets"])
    np.testing.assert_allclose(np.asarray(ref["cam"]),
                               out["cam"], rtol=1e-6, atol=1e-6)


def test_temporal_state_advances(app):
    # betas filter must be initialized after a run with detections
    loop = StreamingLoop(app, max_frames=3)
    loop.run(SyntheticSource(3))
    assert bool(app.filter_state.left.betas.initialized) or \
        bool(app.filter_state.right.betas.initialized)
