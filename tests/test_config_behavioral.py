"""Behavioral config wiring: change the value, observe the output.

Round-3 review found that ``cfg.kernel_sizes[-1]`` was threaded all the
way to ``decode_centers`` and then silently dropped (the grep-based
test_config_consumed.py saw a consumer and passed). These tests close
that class of bug for the parser-family knobs by exercising the REAL
wiring path — ``forward_fn`` with a stub network, so no conv cost — and
asserting that changing each Config value changes (or provably cannot
change, see max_hand) the observable output.

Reference semantics: acr/result_parser.py:219 (kernel), :221-224
(top-K), :42-47 (prior gate), config.py:131 (conf thresh).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

import acr_tpu.parser.parse as parse_mod
from acr_tpu.config import Config
from acr_tpu.models.mano import load_mano_model
from acr_tpu.parser.center import decode_centers, nms_heatmap
from acr_tpu.pipeline.infer import forward_fn

MANO_DIR = os.path.join(os.path.dirname(__file__), "..", "model_data", "mano")
S = 64  # centermap size


def _center_map(peaks):
    m = np.zeros((1, S, S, 1), np.float32)
    for y, x, v in peaks:
        m[0, y, x, 0] = v
    return m


class _StubNet:
    """Stands in for ACRNet: returns crafted maps so parser wiring is
    observable without paying a backbone forward."""

    def __init__(self, l_peaks, r_peaks, rng):
        self.outputs = {
            "l_center_map": jnp.asarray(_center_map(l_peaks)),
            "r_center_map": jnp.asarray(_center_map(r_peaks)),
            "l_params_maps": jnp.asarray(
                rng.randn(1, S, S, 109).astype(np.float32) * 0.1),
            "r_params_maps": jnp.asarray(
                rng.randn(1, S, S, 109).astype(np.float32) * 0.1),
            "l_prior_maps": jnp.asarray(
                rng.randn(1, S, S, 106).astype(np.float32) * 0.1),
            "r_prior_maps": jnp.asarray(
                rng.randn(1, S, S, 106).astype(np.float32) * 0.1),
        }

    def apply(self, params, image):
        return self.outputs


@pytest.fixture(scope="module")
def manos():
    ml, _ = load_mano_model(MANO_DIR, "left")
    mr, _ = load_mano_model(MANO_DIR, "right")
    return ml, mr


def _run(net, manos, **cfg_overrides):
    cfg = Config(mano_model_path=MANO_DIR, **cfg_overrides)
    image = jnp.zeros((1, 8, 8, 3), jnp.uint8)
    offsets = jnp.asarray(
        np.array([[512, 512, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32))
    return forward_fn(net, {}, manos[0], manos[1], image, offsets, cfg)


# ---------------------------------------------------------------- kernel

def test_nms_kernel_changes_decode():
    """The round-3 repro, pinned: two peaks 2 cells apart. Kernel 5
    suppresses the weaker; kernel 3 keeps it as the second candidate."""
    m = jnp.asarray(_center_map([(10, 10, 0.9), (10, 12, 0.8)]))
    k5 = decode_centers(m, k=2, conf_thresh=0.35, nms_kernel=5)
    k3 = decode_centers(m, k=2, conf_thresh=0.35, nms_kernel=3)
    # slot 0: the global max survives any kernel
    assert int(k5.flat_inds[0, 0]) == 10 * S + 10
    assert int(k3.flat_inds[0, 0]) == 10 * S + 10
    # slot 1: only kernel 3 lets the second peak through
    assert not bool(k5.valid[0, 1]), "kernel 5 must suppress the 2-apart peak"
    assert bool(k3.valid[0, 1]), "kernel 3 must keep the 2-apart peak"
    assert int(k3.flat_inds[0, 1]) == 10 * S + 12
    np.testing.assert_allclose(float(k3.scores[0, 1]), 0.8, atol=1e-6)


@pytest.mark.parametrize("kernel", [3, 5, 7])
def test_nms_matches_torch_maxpool(kernel, rng):
    """nms_heatmap == x * (MaxPool2d(k, stride=1, pad=(k-1)//2)(x) == x)
    — the reference's exact NMS (acr/result_parser.py:245-249)."""
    torch = pytest.importorskip("torch")
    x = rng.rand(2, S, S).astype(np.float32)
    ours = np.asarray(nms_heatmap(jnp.asarray(x), kernel))
    with torch.no_grad():
        t = torch.from_numpy(x)[:, None]
        pooled = torch.nn.functional.max_pool2d(
            t, kernel, stride=1, padding=(kernel - 1) // 2)
        keep = (pooled == t).float()
        want = (t * keep)[:, 0].numpy()
    np.testing.assert_allclose(ours, want, atol=1e-7)


def test_cfg_kernel_and_max_hand_reach_decode(manos, monkeypatch, rng):
    """The full wiring chain: cfg.kernel_sizes[-1] / cfg.max_hand must
    arrive at decode_centers as its nms_kernel / k arguments. A spy on
    the real decode plus the behavioral test above covers both halves of
    the round-3 bug (value dropped in transit / value ignored inside)."""
    seen = []
    real = decode_centers

    def spy(center_map, k=1, conf_thresh=0.35, nms_kernel=5):
        seen.append((k, nms_kernel, conf_thresh))
        return real(center_map, k, conf_thresh, nms_kernel=nms_kernel)

    monkeypatch.setattr(parse_mod, "decode_centers", spy)
    net = _StubNet([(10, 10, 0.9)], [(20, 20, 0.9)], rng)
    _run(net, manos, kernel_sizes=(5, 3), max_hand=2,
         centermap_conf_thresh=0.41)
    assert seen, "decode_centers never called through forward_fn"
    for k, nms_kernel, conf in seen:
        assert nms_kernel == 3, "cfg.kernel_sizes[-1] dropped in transit"
        assert k == 2, "cfg.max_hand dropped in transit"
        assert conf == pytest.approx(0.41), "conf_thresh dropped in transit"


def test_max_hand_changes_candidate_width():
    """max_hand is the top-K width (train-era; inference reads slot 0
    only, so it is invariant in forward_fn outputs BY DESIGN — the
    observable behavior is the candidate-slot count)."""
    m = jnp.asarray(_center_map([(5, 5, 0.9), (40, 40, 0.8), (20, 50, 0.7)]))
    for k in (1, 2, 4):
        dec = decode_centers(m, k=k, conf_thresh=0.35)
        assert dec.flat_inds.shape == (1, k)
        assert dec.valid.shape == (1, k)
    dec = decode_centers(m, k=4, conf_thresh=0.35)
    assert np.asarray(dec.valid[0]).tolist() == [True, True, True, False]


# ------------------------------------------------------------- threshold

def test_conf_thresh_flips_detection(manos, rng):
    net = _StubNet([(10, 10, 0.5)], [(20, 20, 0.9)], rng)
    lo = _run(net, manos, centermap_conf_thresh=0.35)
    hi = _run(net, manos, centermap_conf_thresh=0.6)
    assert np.asarray(lo["detection_flag"][0]).tolist() == [True, True]
    assert np.asarray(hi["detection_flag"][0]).tolist() == [False, True]
    # the undetected hand falls back to flat index 0's params
    assert not np.allclose(np.asarray(lo["params"][0, 0]),
                           np.asarray(hi["params"][0, 0]))


# ------------------------------------------------------------ prior gate

def test_prior_gate_px_gates_cross_prior(manos, rng):
    # centers 10 map-cells apart: gate 32 applies the prior, gate 5 zeroes it
    net = _StubNet([(10, 10, 0.9)], [(10, 20, 0.9)], rng)
    wide = _run(net, manos, prior_gate_px=32.0)
    tight = _run(net, manos, prior_gate_px=5.0)
    l_raw = np.asarray(net.outputs["l_params_maps"]).reshape(S * S, 109)[
        10 * S + 10]
    l_pri = np.asarray(net.outputs["l_prior_maps"]).reshape(S * S, 106)[
        10 * S + 20]
    np.testing.assert_allclose(np.asarray(tight["params"][0, 0]), l_raw,
                               atol=1e-6)
    want = l_raw.copy()
    want[3:] += l_pri
    np.testing.assert_allclose(np.asarray(wide["params"][0, 0]), want,
                               atol=1e-5)


# --------------------------------------------------------- head_block_num

def test_head_block_num_changes_structure():
    """Model-shape knob: the head tower depth must follow the config."""
    import jax
    from acr_tpu.models.acr import ACRNet

    def head_block_keys(n):
        net = ACRNet(head_block_num=n)
        params = jax.eval_shape(
            lambda: net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3), jnp.uint8)))
        names = set()
        jax.tree_util.tree_map_with_path(
            lambda p, x: names.add("/".join(str(k.key) for k in p
                                            if hasattr(k, "key"))), params)
        return {n for n in names if "blk" in n}  # HeadStack names blocks blk{k}

    k1, k2 = head_block_keys(1), head_block_keys(2)
    assert k1 != k2 and len(k2) > len(k1)
