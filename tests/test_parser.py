"""Parser tests: NMS, top-K decode, sampling, cross-prior gating."""

import numpy as np
import pytest
import jax.numpy as jnp

from acr_tpu.parser import decode_centers, nms_heatmap, parse_outputs, \
    sample_at_index, split_params
from acr_tpu.ops.rotations import rot6d_to_axis_angle


def make_center_map(peaks, size=64, value=1.0):
    """peaks: list of (y, x[, v]); returns (1, size, size, 1)."""
    m = np.zeros((1, size, size, 1), np.float32)
    for p in peaks:
        y, x = p[0], p[1]
        v = p[2] if len(p) > 2 else value
        m[0, y, x, 0] = v
        # small shoulder so NMS has something to suppress
        if x + 1 < size:
            m[0, y, x + 1, 0] = max(m[0, y, x + 1, 0], v * 0.5)
    return m


def test_nms_suppresses_shoulders():
    m = make_center_map([(10, 10)])
    out = np.asarray(nms_heatmap(jnp.asarray(m)))
    assert out[0, 10, 10, 0] == 1.0
    assert out[0, 10, 11, 0] == 0.0      # shoulder killed
    assert (out > 0).sum() == 1


def test_nms_keeps_distant_peaks():
    m = make_center_map([(5, 5), (40, 40, 0.8)])
    out = np.asarray(nms_heatmap(jnp.asarray(m)))
    assert out[0, 5, 5, 0] == 1.0 and out[0, 40, 40, 0] == 0.8


def test_decode_topk_and_threshold():
    m = make_center_map([(7, 9, 0.9), (30, 40, 0.4), (50, 20, 0.2)])
    dec = decode_centers(jnp.asarray(m), k=3, conf_thresh=0.35)
    got_yx = np.asarray(dec.yx[0]).astype(int).tolist()
    assert got_yx[0] == [7, 9] and got_yx[1] == [30, 40]
    assert np.asarray(dec.valid[0]).tolist() == [True, True, False]
    assert np.asarray(dec.flat_inds[0])[0] == 7 * 64 + 9


def test_decode_below_threshold_invalid():
    m = make_center_map([(7, 9, 0.1)])
    dec = decode_centers(jnp.asarray(m), k=1, conf_thresh=0.35)
    assert not bool(dec.valid[0, 0])


def test_sample_at_index(rng):
    maps = rng.randn(2, 4, 4, 5).astype(np.float32)
    inds = np.array([3, 9])
    got = np.asarray(sample_at_index(jnp.asarray(maps), jnp.asarray(inds)))
    want = np.stack([maps[0].reshape(16, 5)[3], maps[1].reshape(16, 5)[9]])
    np.testing.assert_allclose(got, want)


def test_split_params_layout(rng):
    p = rng.randn(2, 2, 109).astype(np.float32)
    d = split_params(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(d["cam"]), p[..., :3])
    np.testing.assert_allclose(np.asarray(d["betas"]), p[..., 99:])
    want_orient = np.asarray(rot6d_to_axis_angle(jnp.asarray(p[..., 3:9])))
    np.testing.assert_allclose(np.asarray(d["poses"])[..., :3], want_orient, atol=1e-6)
    assert d["poses"].shape == (2, 2, 48)


def _outputs_with(l_peak, r_peak, rng, size=64):
    out = {
        "l_center_map": jnp.asarray(make_center_map([l_peak], size)),
        "r_center_map": jnp.asarray(make_center_map([r_peak], size)),
        "l_params_maps": jnp.asarray(rng.randn(1, size, size, 109).astype(np.float32)),
        "r_params_maps": jnp.asarray(rng.randn(1, size, size, 109).astype(np.float32)),
        "l_prior_maps": jnp.asarray(rng.randn(1, size, size, 106).astype(np.float32)),
        "r_prior_maps": jnp.asarray(rng.randn(1, size, size, 106).astype(np.float32)),
    }
    return out


def test_cross_prior_applied_when_close(rng):
    out = _outputs_with((10, 10, 0.9), (12, 12, 0.9), rng)
    parsed = parse_outputs(out)
    l_ind, r_ind = 10 * 64 + 10, 12 * 64 + 12
    l_raw = np.asarray(sample_at_index(out["l_params_maps"], jnp.asarray([l_ind])))[0]
    l_pri = np.asarray(sample_at_index(out["l_prior_maps"], jnp.asarray([r_ind])))[0]
    want = l_raw.copy()
    want[3:] += l_pri
    np.testing.assert_allclose(np.asarray(parsed.params[0, 0]), want, atol=1e-5)
    assert np.asarray(parsed.detection_flag[0]).tolist() == [True, True]


def test_cross_prior_gated_when_far(rng):
    out = _outputs_with((5, 5, 0.9), (60, 60, 0.9), rng)   # dist >> 32
    parsed = parse_outputs(out)
    l_raw = np.asarray(sample_at_index(out["l_params_maps"],
                                       jnp.asarray([5 * 64 + 5])))[0]
    np.testing.assert_allclose(np.asarray(parsed.params[0, 0]), l_raw, atol=1e-6)


def test_cross_prior_skipped_when_one_missing(rng):
    out = _outputs_with((10, 10, 0.9), (12, 12, 0.1), rng)  # right below thresh
    parsed = parse_outputs(out)
    flags = np.asarray(parsed.detection_flag[0])
    assert flags.tolist() == [True, False]
    # left params untouched by prior; right falls back to index 0
    l_raw = np.asarray(sample_at_index(out["l_params_maps"],
                                       jnp.asarray([10 * 64 + 10])))[0]
    r_raw = np.asarray(sample_at_index(out["r_params_maps"], jnp.asarray([0])))[0]
    np.testing.assert_allclose(np.asarray(parsed.params[0, 0]), l_raw, atol=1e-6)
    np.testing.assert_allclose(np.asarray(parsed.params[0, 1]), r_raw, atol=1e-6)
    assert int(parsed.flat_inds[0, 1]) == 0


def test_centers_and_conf(rng):
    out = _outputs_with((10, 20, 0.9), (30, 40, 0.8), rng)
    parsed = parse_outputs(out)
    np.testing.assert_allclose(np.asarray(parsed.centers[0, 0]), [20, 10])  # (x, y)
    np.testing.assert_allclose(np.asarray(parsed.centers[0, 1]), [40, 30])
    np.testing.assert_allclose(np.asarray(parsed.centers_conf[0]), [0.9, 0.8],
                               atol=1e-6)


def test_merge_mode(rng):
    out = _outputs_with((10, 10, 0.9), (12, 12, 0.9), rng)
    merge = {"kernel": jnp.asarray(rng.randn(424, 212).astype(np.float32) * 0.01),
             "bias": jnp.asarray(rng.randn(212).astype(np.float32))}
    parsed = parse_outputs(out, prior_mode="merge", merge_params=merge)
    l_ind, r_ind = 10 * 64 + 10, 12 * 64 + 12
    l_raw = np.asarray(sample_at_index(out["l_params_maps"], jnp.asarray([l_ind])))[0]
    l_pri = np.asarray(sample_at_index(out["l_prior_maps"], jnp.asarray([r_ind])))[0]
    r_raw = np.asarray(sample_at_index(out["r_params_maps"], jnp.asarray([r_ind])))[0]
    r_pri = np.asarray(sample_at_index(out["r_prior_maps"], jnp.asarray([l_ind])))[0]
    x = np.concatenate([l_raw[3:], l_pri, r_raw[3:], r_pri])
    merged = x @ np.asarray(merge["kernel"]) + np.asarray(merge["bias"])
    np.testing.assert_allclose(np.asarray(parsed.params[0, 0, 3:]), merged[:106],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(parsed.params[0, 1, 3:]), merged[106:],
                               atol=1e-4)
