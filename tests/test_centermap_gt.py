"""Center-map rendering <-> decoding round trip (train-era parity)."""

import numpy as np
import jax.numpy as jnp

from acr_tpu.parser.center import decode_centers
from acr_tpu.parser.centermap_gt import gaussian_kernel, render_center_maps


def test_gaussian_kernel_matches_reference_formula():
    k = gaussian_kernel(5, sigma=1.0)
    assert k.shape == (5, 5)
    assert k[2, 2] == 1.0
    np.testing.assert_allclose(k[2, 3], np.exp(-0.5), atol=1e-9)
    np.testing.assert_allclose(k, k.T, atol=1e-12)


def test_render_decode_round_trip():
    centers = jnp.asarray([[[10.0, 20.0], [40.0, 50.0]]])   # (1, 2, 2) yx
    valid = jnp.asarray([[True, True]])
    hm = render_center_maps(centers, valid, size=64)
    assert hm.shape == (1, 64, 64, 1)
    dec = decode_centers(hm, k=2, conf_thresh=0.35)
    got = np.sort(np.asarray(dec.yx[0]), axis=0)
    np.testing.assert_array_equal(got, [[10, 20], [40, 50]])
    assert np.asarray(dec.valid[0]).all()


def test_invalid_instances_not_rendered():
    centers = jnp.asarray([[[10.0, 20.0], [40.0, 50.0]]])
    valid = jnp.asarray([[True, False]])
    hm = np.asarray(render_center_maps(centers, valid, size=64))
    assert hm[0, 10, 20, 0] == 1.0
    assert hm[0, 40, 50, 0] == 0.0


def test_overlapping_peaks_max_combined():
    centers = jnp.asarray([[[10.0, 10.0], [10.0, 11.0]]])
    valid = jnp.asarray([[True, True]])
    hm = np.asarray(render_center_maps(centers, valid, size=32))
    assert hm.max() == 1.0
