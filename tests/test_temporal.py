"""OneEuro functional filter vs an independent numpy reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from acr_tpu.pipeline.temporal import (
    init_channel,
    init_two_hand_filter,
    oneeuro_step,
    smooth_two_hands,
)


class NumpyOneEuro:
    """Straight transcription of the published 1-euro filter algorithm."""

    def __init__(self, mincutoff, beta, dcutoff=1.0, freq=30.0):
        self.mc, self.beta, self.dc, self.freq = mincutoff, beta, dcutoff, freq
        self.x_prev = None
        self.y_prev = None
        self.dy_prev = None

    def alpha(self, cutoff):
        tau = 1.0 / (2 * np.pi * cutoff)
        return 1.0 / (1.0 + tau * self.freq)

    def __call__(self, x):
        if self.x_prev is None:
            dx = np.zeros_like(x)
            edx = dx
            y = x
        else:
            dx = (x - self.x_prev) * self.freq
            a_d = self.alpha(self.dc)
            edx = a_d * dx + (1 - a_d) * self.dy_prev
            cutoff = self.mc + self.beta * np.abs(edx)
            a = self.alpha(cutoff)
            y = a * x + (1 - a) * self.y_prev
        self.x_prev, self.y_prev, self.dy_prev = x, y, edx
        return y


def test_oneeuro_matches_numpy(rng):
    ref = NumpyOneEuro(4.0, 0.7)
    state = init_channel((6,))
    xs = rng.randn(20, 6).astype(np.float32)
    for x in xs:
        state, y = oneeuro_step(state, jnp.asarray(x), 4.0, 0.7)
        np.testing.assert_allclose(np.asarray(y), ref(x), atol=1e-5)


def test_oneeuro_dx_from_output_matches_numpy(rng):
    """The aliased articulation/betas channel (dx against the previous
    OUTPUT — the reference app's view-aliasing semantics, see
    pipeline/temporal.py docstring) vs a numpy transcription."""
    ref = NumpyOneEuro(4.0, 0.7)
    state = init_channel((6,))
    xs = rng.randn(20, 6).astype(np.float32)
    for i, x in enumerate(xs):
        state, y = oneeuro_step(state, jnp.asarray(x), 4.0, 0.7,
                                dx_from_output=True)
        want = ref(x)
        ref.x_prev = ref.y_prev          # the app's assign-back aliasing
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-5,
                                   err_msg=f"step {i}")
    # sanity: diverges from the raw-dx filter once history matters
    ref2 = NumpyOneEuro(4.0, 0.7)
    clean = [ref2(x) for x in xs]
    assert not np.allclose(clean[-1], np.asarray(y), atol=1e-4)


def test_oneeuro_smooths_noise(rng):
    state = init_channel(())
    t = np.linspace(0, 2 * np.pi, 120)
    clean = np.sin(t)
    noisy = clean + rng.randn(120) * 0.2
    ys = []
    for x in noisy.astype(np.float32):
        state, y = oneeuro_step(state, jnp.asarray(x), 1.0, 0.1)
        ys.append(float(y))
    ys = np.array(ys)
    assert np.abs(ys[20:] - clean[20:]).mean() < np.abs(noisy[20:] - clean[20:]).mean()


def test_smooth_two_hands_gating(rng):
    state = init_two_hand_filter()
    poses = rng.randn(2, 48).astype(np.float32) * 0.2
    betas = rng.randn(2, 10).astype(np.float32)
    det = jnp.asarray([True, False])
    state, p1, b1 = smooth_two_hands(state, jnp.asarray(poses),
                                     jnp.asarray(betas), det)
    # first call passes raw values through for the detected hand;
    # undetected hand also passes through untouched
    np.testing.assert_allclose(np.asarray(b1), betas, atol=1e-5)
    assert bool(state.left.betas.initialized)
    assert not bool(state.right.betas.initialized)

    # second frame: detected hand is filtered, undetected passthrough
    poses2 = poses + 0.3
    betas2 = betas + 1.0
    state, p2, b2 = smooth_two_hands(state, jnp.asarray(poses2),
                                     jnp.asarray(betas2), det)
    assert not np.allclose(np.asarray(b2[0]), betas2[0])   # left smoothed
    np.testing.assert_allclose(np.asarray(b2[1]), betas2[1], atol=1e-6)


def test_orient_smoothed_in_rotmat_space(rng):
    # two nearby rotations: smoothing must land between them and stay valid
    state = init_two_hand_filter()
    aa1 = np.array([0.0, 0.0, 0.3], np.float32)
    aa2 = np.array([0.0, 0.0, 0.9], np.float32)
    det = jnp.asarray([True, True])
    mk = lambda aa: jnp.asarray(
        np.concatenate([np.tile(aa, (1,)), np.zeros(45)]).astype(np.float32))
    poses = jnp.stack([mk(aa1), mk(aa1)])
    betas = jnp.zeros((2, 10))
    state, _, _ = smooth_two_hands(state, poses, betas, det)
    poses2 = jnp.stack([mk(aa2), mk(aa2)])
    state, p2, _ = smooth_two_hands(state, poses2, betas, det)
    angle = np.asarray(p2[0, :3])[2]
    assert 0.3 < angle < 0.9


def test_scan_compatible(rng):
    frames = jnp.asarray(rng.randn(10, 2, 48).astype(np.float32) * 0.1)
    betas = jnp.asarray(rng.randn(10, 2, 10).astype(np.float32))
    det = jnp.ones((10, 2), bool)

    def step(state, inp):
        p, b, d = inp
        state, ps, bs = smooth_two_hands(state, p, b, d)
        return state, (ps, bs)

    state = init_two_hand_filter()
    _, (ps, bs) = jax.lax.scan(step, state, (frames, betas, det))
    assert ps.shape == (10, 2, 48) and bs.shape == (10, 2, 10)

    # scan output equals the sequential loop
    state2 = init_two_hand_filter()
    for i in range(10):
        state2, p_i, b_i = smooth_two_hands(state2, frames[i], betas[i], det[i])
    np.testing.assert_allclose(np.asarray(ps[-1]), np.asarray(p_i), atol=1e-5)
