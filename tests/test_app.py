"""App-driver tests: folder/image modes, temporal path, writers (CPU)."""

import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.io.writers import collect_image_list, save_results, save_video
from acr_tpu.models.acr import ACRNet
from acr_tpu.pipeline.app import ACRApp
from acr_tpu.pipeline.results import reorganize_results, sort_results_by_hand

MANO_DIR = os.path.join(os.path.dirname(__file__), "..", "model_data", "mano")


@pytest.fixture(scope="module")
def small_params():
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
    return jax.tree_util.tree_map_with_path(fix, params)


def make_cfg(tmp_path, **kw):
    base = dict(input_size=128, mano_model_path=MANO_DIR,
                renderer="tpu", render_size=128,
                output_dir=str(tmp_path / "out") + "/")
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("frames")
    import cv2
    for i in range(3):
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"{i:06d}.jpg"), img)
    return str(d)


def test_collect_image_list(frames_dir):
    files = collect_image_list(frames_dir)
    assert len(files) == 3
    assert [os.path.basename(f) for f in files] == \
        ["000000.jpg", "000001.jpg", "000002.jpg"]


def test_folder_mode_end_to_end(tmp_path, frames_dir, small_params):
    cfg = make_cfg(tmp_path, demo_mode="folder", inputs=frames_dir,
                   save_dict_results=True)
    app = ACRApp(cfg, params=small_params)
    results = app.run()
    assert len(results) == 3
    # rendered frames + results pickle + re-encoded video on disk
    outs = os.listdir(app.output_dir)
    assert sum(o.endswith(".jpg") for o in outs) == 3
    pkls = [o for o in outs if o.endswith(".pkl")]
    assert len(pkls) == 1
    data = pickle.load(open(os.path.join(app.output_dir, pkls[0]), "rb"))
    assert set(data) == set(results)
    assert any(o.endswith(".mp4") for o in outs)


def test_image_mode_and_temporal(tmp_path, frames_dir, small_params):
    img0 = os.path.join(frames_dir, "000000.jpg")
    cfg = make_cfg(tmp_path, demo_mode="image", inputs=img0,
                   temporal_optimization=True)
    app = ACRApp(cfg, params=small_params)
    r1 = app.run()
    assert img0 in r1
    # second frame through the same app exercises warmed filter state
    import cv2
    r2 = app.process_frame(cv2.imread(img0), img0)
    for hands in r2.values():
        for h in hands:
            assert np.isfinite(np.float32(h["poses"])).all()


def test_raster_overflow_probe_wiring(tmp_path, frames_dir, small_params,
                                      caplog):
    # raster_overflow_every=1 dispatches the capacity probe with every
    # rendered frame and consumes it from the single readback
    import logging
    img0 = os.path.join(frames_dir, "000000.jpg")
    cfg = make_cfg(tmp_path, demo_mode="image", inputs=img0,
                   raster_overflow_every=1)
    app = ACRApp(cfg, params=small_params)
    with caplog.at_level(logging.DEBUG, logger="acr_tpu"):
        app.run()
    assert app._frame_idx == 1
    probe_lines = [r for r in caplog.records
                   if "raster" in r.getMessage()
                   and ("capacity" in r.getMessage()
                        or "overflow" in r.getMessage())]
    assert probe_lines, "probe produced no log line"


def test_image_mode_missing_input(tmp_path, small_params):
    cfg = make_cfg(tmp_path, demo_mode="image", inputs="/nonexistent.jpg")
    app = ACRApp(cfg, params=small_params)
    with pytest.raises(FileNotFoundError):
        app.run()


def test_reorganize_results_shapes(rng):
    out = {
        "detection_flag": np.array([[True, False]]),
        "cam": rng.randn(1, 2, 3), "cam_trans": rng.randn(1, 2, 3),
        "poses": rng.randn(1, 2, 48), "betas": rng.randn(1, 2, 10),
        "j3d": rng.randn(1, 2, 21, 3), "verts": rng.randn(1, 2, 778, 3),
        "pj2d": rng.randn(1, 2, 21, 2), "pj2d_org": rng.randn(1, 2, 21, 2),
    }
    res = reorganize_results(out, ["a.jpg"])
    assert len(res["a.jpg"]) == 1
    assert int(res["a.jpg"][0]["hand_type"]) == 0
    assert res["a.jpg"][0]["verts"].dtype == np.float16
    srt = sort_results_by_hand(res)
    assert len(srt["a.jpg"]["left"]) == 1 and len(srt["a.jpg"]["right"]) == 0


def test_fused_steps_pack_the_probe(tmp_path, small_params, caplog):
    """The probe must survive the FUSED paths end to end: it rides the
    packed single readback of both the stream step and the chunk step.

    Regression: render_overflow_probe used to return a raw tuple, which
    traced fine on the eager per-frame path but crashed pack_outputs
    (`'tuple' object has no attribute 'shape'`) the moment
    raster_overflow_every > 0 met a fused step — no test drove that
    combination (r5 review).
    """
    import logging
    from acr_tpu.pipeline.app import unpack_outputs

    img = np.zeros((128, 128, 3), np.uint8)
    off = np.array([[128, 128, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32)

    # webcam (stream) fused step
    cfg = make_cfg(tmp_path, demo_mode="webcam",
                   temporal_optimization=True, raster_overflow_every=1)
    app = ACRApp(cfg, params=small_params)
    assert app._jit_stream_step is not None
    # unpack_stream consumes (pops) the probe and logs it
    with caplog.at_level(logging.DEBUG, logger="acr_tpu"):
        out = app.unpack_stream(app.stream_step(
            {"image": img[None], "offsets": off}))
    assert "_raster_overflow" not in out          # consumed
    assert any("capacity probe" in r.getMessage() or
               "overflow" in r.getMessage() for r in caplog.records)

    # folder (chunk) fused step: per-frame probes reduce to one vector
    cfg = make_cfg(tmp_path, demo_mode="folder", val_batch_size=2,
                   raster_overflow_every=1)
    app = ACRApp(cfg, params=small_params)
    assert app._jit_chunk_step is not None, app._fused_bypass_reason
    imgs = np.zeros((2, 128, 128 * 3), np.uint8)
    offs = np.tile(off, (2, 1))
    _, packed = app._jit_chunk_step(
        app.pipeline.params, app.pipeline.mano_l, app.pipeline.mano_r,
        app.filter_state, imgs, offs)
    out = unpack_outputs(packed, list(app._chunk_spec))
    assert out["_raster_overflow"].shape == (4,)
