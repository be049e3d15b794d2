"""OneEuro temporal filter as a pure function of (state, x) -> (state, y).

The reference keeps two stateful host-side OneEuro filter dicts (one
per hand type) and runs them between two GPU stages, forcing a
device->host->device round trip every frame (reference:
acr/main.py:50-53,69-83; acr/utils.py:1472-1527). Here the filter state
is an explicit pytree of device arrays, so smoothing (a) stays on
device in the streaming path and (b) threads through ``lax.scan`` for
offline video batches.

Semantics match the reference exactly — including one subtle aliasing
behavior of its app loop:
* the global orientation is smoothed in rotation-matrix space and
  converted back to axis-angle (utils.py:1466-1470);
* articulation (45) and betas (10) are smoothed directly — with the
  derivative taken against the previous *output*, not the previous raw
  input: the reference filter stores ``prev_raw_value`` as a torch VIEW
  into the params tensor (utils.py:1496,1527 via main.py:78-83), and
  the app then assigns the smoothed values back into that same storage,
  so from the third frame on its dx is ``(x_t - y_{t-1}) * freq``
  (``dx_from_output=True`` here; verified against the running reference
  in tests/test_reference_model_parity.py and the composed-chain
  harness). The orient filter is NOT aliased — it stores a freshly
  computed rotation matrix — so it keeps the textbook raw-dx form;
* coefficients: poses/orient (mincutoff=smooth_coeff, beta=0.7),
  betas (0.6, 0.7); dcutoff 1.0; freq 30 (utils.py:1472-1473);
* an undetected hand leaves its filter state untouched.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from acr_tpu.ops.rotations import axis_angle_to_rotmat, rotmat_to_axis_angle


class ChannelState(NamedTuple):
    """LowPass pair (value + derivative) for one filtered tensor."""
    x_prev: jnp.ndarray        # previous raw input
    y_prev: jnp.ndarray        # previous filtered output
    dy_prev: jnp.ndarray       # previous filtered derivative
    initialized: jnp.ndarray   # () bool


def init_channel(shape) -> ChannelState:
    z = jnp.zeros(shape, jnp.float32)
    return ChannelState(z, z, z, jnp.asarray(False))


def _alpha(cutoff, freq):
    # reference compute_alpha (utils.py:1509-1512): 1 / (1 + tau/te)
    tau = 1.0 / (2.0 * jnp.pi * cutoff)
    te = 1.0 / freq
    return 1.0 / (1.0 + tau / te)


def oneeuro_step(state: ChannelState, x: jnp.ndarray, mincutoff: float,
                 beta: float, dcutoff: float = 1.0, freq: float = 30.0,
                 dx_from_output: bool = False
                 ) -> Tuple[ChannelState, jnp.ndarray]:
    """One filter update (vectorized over the tensor).

    ``dx_from_output=True`` reproduces the reference app's aliased
    articulation/betas channels (see module docstring): the derivative
    base is the previous smoothed output instead of the previous raw
    input. Identical through the first two calls (y_1 == x_1).
    """
    first = ~state.initialized
    base = state.y_prev if dx_from_output else state.x_prev
    dx = jnp.where(first, 0.0, (x - base) * freq)
    # derivative low-pass: first call passes dx straight through
    a_d = _alpha(dcutoff, freq)
    edx = jnp.where(first, dx, a_d * dx + (1.0 - a_d) * state.dy_prev)
    cutoff = mincutoff + beta * jnp.abs(edx)
    a = _alpha(cutoff, freq)
    y = jnp.where(first, x, a * x + (1.0 - a) * state.y_prev)
    return ChannelState(x, y, edx, jnp.asarray(True)), y


class HandFilterState(NamedTuple):
    """OneEuro state for one hand slot (orient in matrix space)."""
    orient: ChannelState       # (3, 3)
    pose: ChannelState         # (45,)
    betas: ChannelState        # (10,)


def init_hand_filter() -> HandFilterState:
    return HandFilterState(init_channel((3, 3)), init_channel((45,)),
                           init_channel((10,)))


def smooth_hand(state: HandFilterState, poses48: jnp.ndarray,
                betas10: jnp.ndarray, detected: jnp.ndarray,
                smooth_coeff: float = 4.0
                ) -> Tuple[HandFilterState, jnp.ndarray, jnp.ndarray]:
    """Smooth one hand's parameters; no-op (state preserved) if not detected."""
    rot = axis_angle_to_rotmat(poses48[:3])
    s_orient, rot_s = oneeuro_step(state.orient, rot, smooth_coeff, 0.7)
    orient_s = rotmat_to_axis_angle(rot_s[None])[0]
    s_pose, pose_s = oneeuro_step(state.pose, poses48[3:], smooth_coeff, 0.7,
                                  dx_from_output=True)
    s_betas, betas_s = oneeuro_step(state.betas, betas10, 0.6, 0.7,
                                    dx_from_output=True)

    new_state = HandFilterState(s_orient, s_pose, s_betas)
    keep = lambda new, old: jax.tree.map(
        lambda a, b: jnp.where(detected, a, b), new, old)
    out_state = keep(new_state, state)
    poses_out = jnp.where(detected,
                          jnp.concatenate([orient_s, pose_s]), poses48)
    betas_out = jnp.where(detected, betas_s, betas10)
    return out_state, poses_out, betas_out


class TwoHandFilterState(NamedTuple):
    left: HandFilterState
    right: HandFilterState


def init_two_hand_filter() -> TwoHandFilterState:
    return TwoHandFilterState(init_hand_filter(), init_hand_filter())


def smooth_two_hands(state: TwoHandFilterState, poses: jnp.ndarray,
                     betas: jnp.ndarray, detection_flag: jnp.ndarray,
                     smooth_coeff: float = 4.0):
    """poses (2,48), betas (2,10), detection_flag (2,) -> smoothed pair."""
    sl, pl, bl = smooth_hand(state.left, poses[0], betas[0],
                             detection_flag[0], smooth_coeff)
    sr, pr, br = smooth_hand(state.right, poses[1], betas[1],
                             detection_flag[1], smooth_coeff)
    return (TwoHandFilterState(sl, sr),
            jnp.stack([pl, pr]), jnp.stack([bl, br]))


def smooth_sequence(state: TwoHandFilterState, poses: jnp.ndarray,
                    betas: jnp.ndarray, detection_flag: jnp.ndarray,
                    smooth_coeff: float = 4.0):
    """Filter a whole frame sequence via lax.scan (offline video mode).

    poses (T,2,48), betas (T,2,10), detection_flag (T,2) ->
    (final_state, smoothed poses (T,2,48), smoothed betas (T,2,10)).
    Exactly equals running smooth_two_hands frame by frame.
    """
    def step(st, inp):
        p, b, d = inp
        st, ps, bs = smooth_two_hands(st, p, b, d, smooth_coeff)
        return st, (ps, bs)

    state, (ps, bs) = jax.lax.scan(step, state,
                                   (poses, betas, detection_flag))
    return state, ps, bs
