"""Batched folder/video mode (`val_batch_size > 1`).

Pins the round-2 restructure of ``_run_batched``:
* each frame is decoded + preprocessed exactly once (round 1 paid the
  single-core host decode twice for visualized runs);
* batched results equal the per-frame path;
* chunk-wise OneEuro smoothing with carried state equals the
  whole-sequence lax.scan (the filter is causal).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.models.acr import ACRNet
from acr_tpu.pipeline.app import ACRApp
from acr_tpu.pipeline.temporal import init_two_hand_filter, smooth_sequence

MANO_DIR = os.path.join(os.path.dirname(__file__), "..", "model_data", "mano")


@pytest.fixture(scope="module")
def small_params():
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.uint8))

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


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("vidframes")
    import cv2
    for i in range(5):
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"{i:06d}.jpg"), img)
    return str(d)


def make_cfg(tmp_path, **kw):
    base = dict(input_size=128, mano_model_path=MANO_DIR,
                renderer="tpu", render_size=128, demo_mode="folder",
                output_dir=str(tmp_path / "out") + "/")
    base.update(kw)
    return Config(**base)


def _flat(results):
    return {p: [{k: np.asarray(v) for k, v in h.items()} for h in hands]
            for p, hands in results.items()}


def test_batched_matches_per_frame(tmp_path, frames_dir, small_params):
    r1 = ACRApp(make_cfg(tmp_path / "a", inputs=frames_dir),
                params=small_params).run()
    # batch 2 over 5 frames: 3 chunks, last one padded
    r2 = ACRApp(make_cfg(tmp_path / "b", inputs=frames_dir,
                         val_batch_size=2), params=small_params).run()
    assert set(r1) == set(r2)
    for path in r1:
        assert len(r1[path]) == len(r2[path])
        for h1, h2 in zip(r1[path], r2[path]):
            for key in h1:
                # results dicts are fp16 (reference contract) and the
                # b1/b2 programs differ in XLA reduction order — allow
                # a relative fp16-ulp-scale tolerance
                np.testing.assert_allclose(
                    np.float32(h1[key]), np.float32(h2[key]),
                    rtol=2e-3, atol=2e-3, err_msg=f"{path}:{key}")


def test_batched_decodes_each_frame_once(tmp_path, frames_dir, small_params,
                                         monkeypatch):
    from acr_tpu.pipeline import app as app_mod
    calls = []
    real = app_mod.img_preprocess

    def counted(frame, path, **kw):
        calls.append(path)
        return real(frame, path, **kw)

    monkeypatch.setattr(app_mod, "img_preprocess", counted)
    app = ACRApp(make_cfg(tmp_path, inputs=frames_dir, val_batch_size=2),
                 params=small_params)
    app.run()
    assert len(calls) == 5, f"preprocess ran {len(calls)}x for 5 frames"
    assert len(set(calls)) == 5


def test_batched_temporal_runs_and_is_finite(tmp_path, frames_dir,
                                             small_params):
    app = ACRApp(make_cfg(tmp_path, inputs=frames_dir, val_batch_size=2,
                          temporal_optimization=True), params=small_params)
    results = app.run()
    assert len(results) == 5
    for hands in results.values():
        for h in hands:
            assert np.isfinite(np.float32(h["poses"])).all()


def test_batched_aux_views_rendered(tmp_path, frames_dir, small_params):
    """Non-mesh show_items are honored in batched mode (round-2 review:
    they silently vanished; reference behaviour acr/visualization.py:
    174-254). pj2d/j3d come from the fused chunk outputs; centermap
    forces the per-stage path that emits the heatmaps."""
    out_dir = tmp_path / "out"
    app = ACRApp(make_cfg(tmp_path, inputs=frames_dir, val_batch_size=2,
                          show_items=("mesh", "pj2d", "j3d", "centermap")),
                 params=small_params)
    results = app.run()
    assert len(results) == 5
    names = os.listdir(out_dir)
    for i in range(5):
        for item in ("pj2d", "j3d", "centermap"):
            assert f"{i:06d}_{item}.jpg" in names, (item, sorted(names))


def test_batched_aux_views_fused_path(tmp_path, frames_dir, small_params):
    """pj2d/j3d aux views work on the FUSED chunk step (no heatmaps
    requested), which stays the one-dispatch/one-readback fast path."""
    out_dir = tmp_path / "out"
    app = ACRApp(make_cfg(tmp_path, inputs=frames_dir, val_batch_size=2,
                          show_items=("mesh", "pj2d")),
                 params=small_params)
    app.run()
    names = os.listdir(out_dir)
    assert any(n.endswith("_pj2d.jpg") for n in names), sorted(names)


def test_chunked_smoothing_equals_full_scan(rng):
    poses = jnp.asarray(rng.randn(7, 2, 48).astype(np.float32) * 0.1)
    betas = jnp.asarray(rng.randn(7, 2, 10).astype(np.float32) * 0.1)
    flags = jnp.asarray(rng.rand(7, 2) > 0.3)

    _, p_full, b_full = smooth_sequence(init_two_hand_filter(),
                                        poses, betas, flags)
    st = init_two_hand_filter()
    p_parts, b_parts = [], []
    for i in range(0, 7, 3):                     # chunks of 3, 3, 1
        st, p, b = smooth_sequence(st, poses[i:i + 3], betas[i:i + 3],
                                   flags[i:i + 3])
        p_parts.append(p)
        b_parts.append(b)
    np.testing.assert_allclose(np.concatenate(p_parts), np.asarray(p_full),
                               atol=1e-6)
    np.testing.assert_allclose(np.concatenate(b_parts), np.asarray(b_full),
                               atol=1e-6)
