"""Opt-in int8 quantized inference for the conv-heavy network regions.

v5e MXUs run int8 x int8 -> int32 at 2x the bf16 rate (measured 1.97x
on this chip for the packed b0 conv shape), and int8 activations halve
conv-input HBM traffic. This module provides the serving-grade W8A8
path behind ``Config.quantize='int8'``:

* weights: per-output-channel symmetric int8 (scale = max|w| / 127),
  quantized offline from the float (post-s2d-transform) tree;
* activations: symmetric int8 with STATIC scales calibrated by running
  the float network in "observe" mode (each conv site sows the
  per-input-channel amax of its input into the ``quant_stats``
  collection) — no per-step reductions on the inference path. Scales
  are per-tensor by default; ``per_channel=True`` (mode 'int8_pc')
  uses one scale per input channel, folded EXACTLY into the weights
  before weight quantization (conv is linear per input channel:
  sum_c (x_c s_c)(W_c / s_c) == sum_c x_c W_c), so the only extra
  inference cost is a vector instead of scalar multiply on the
  activation quantize;
* zero-padding semantics are preserved exactly: quant(0) == 0, so the
  padded taps contribute zero like in the float conv.

This is an APPROXIMATION, unlike the s2d/merged-head rewrites
(models/s2d.py) which are exact. It is off by default; accuracy on
real licensed weights must be evaluated before production use
(docs/PERFORMANCE.md). The reference has no quantized path
(/root/reference runs fp32 torch; capability beyond parity).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class QuantConv(nn.Module):
    """W8A8 conv: static-scale int8 quantize -> int8 conv -> dequant.

    Drop-in replacement for ``layers.conv`` at a quantized call site:
    same name ("conv", "conv1", ...), same padding semantics, params
    {kernel_q int8, wscale (Co,), ascale () or (Ci,), [bias]} written
    by ``quantize_tree_int8``. With ``per_channel=True`` the activation
    scales are per input channel and their inverse is already folded
    into ``kernel_q``/``wscale`` (see module docstring), so dequant is
    by ``wscale`` alone.
    """
    features: int
    kernel: Any = 3            # int or (kh, kw)
    stride: Any = 1
    pad: Optional[int] = None
    padding: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
    use_bias: bool = False
    dtype: Any = jnp.float32
    per_channel: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.kernel if isinstance(self.kernel, tuple) \
            else (self.kernel, self.kernel)
        stride = self.stride if isinstance(self.stride, tuple) \
            else (self.stride, self.stride)
        padding = self.padding
        if padding is None:
            p = kernel[0] // 2 if self.pad is None else self.pad
            padding = ((p, p), (p, p))
        kq = self.param("kernel_q", nn.initializers.zeros,
                        kernel + (x.shape[-1], self.features), jnp.int8)
        ws = self.param("wscale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        ashape = (x.shape[-1],) if self.per_channel else ()
        asc = self.param("ascale", nn.initializers.ones, ashape, jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * asc),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, kq, stride, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        deq = ws if self.per_channel else ws / asc
        y = (y.astype(jnp.float32) * deq).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


def calibrate_amax(observe_net, params, images) -> Dict:
    """Run the float network in observe mode over ``images`` (a list of
    uint8 batches) and return per-conv-site PER-INPUT-CHANNEL input
    amax vectors (elementwise max across batches); per-tensor consumers
    reduce with .max(). The observe apply is jitted — an eager apply
    dispatches every op of the 512px network as its own tiny program
    (hundreds of round trips at pipeline-load time on a relayed host).
    """
    run = jax.jit(lambda p, img: observe_net.apply(
        p, img, mutable=["quant_stats"]))
    acc = None
    for img in images:
        _, stats = run(params, jnp.asarray(img))
        stats = jax.tree.map(lambda v: np.asarray(v),
                             stats["quant_stats"])
        acc = stats if acc is None else jax.tree.map(np.maximum, acc, stats)
    return acc


def observe_clone(net):
    """The same ACRNet with quantize='observe' (float convs + amax sow).
    An '_r' mode carries over as 'observe_r' so the regressor call
    sites sow too and get calibrated scales."""
    from acr_tpu.models.acr import ACRNet
    fields = {f.name: getattr(net, f.name)
              for f in net.__dataclass_fields__.values()
              if f.name not in ("parent", "name")}
    fields["quantize"] = "observe" + \
        ("_r" if net.quantize.endswith("_r") else "")
    return ACRNet(**fields)


def default_calibration_frames(input_size: int):
    """Synthetic structural-bound calibration set: uniform noise
    (near-extreme activations through the normalize) + mid-gray. The
    LAST-RESORT default — committed_calibration_frames (real frames)
    is preferred when its artifact exists."""
    r = np.random.RandomState(0)
    return [r.randint(0, 255, (1, input_size, input_size, 3)
                      ).astype(np.uint8),
            np.full((1, input_size, input_size, 3), 127, np.uint8)]


def committed_calibration_frames(input_size: int):
    """The committed REAL-frame default calibration set
    (model_data/calib/calib_frames.npz: preprocessed variants of the
    reference demo photo + the two synthetic structural bounds, built
    by tools/make_calib_frames.py). Returns a list of (1, S, S, 3)
    uint8 batches, or None when the artifact is absent or was built
    for a different input size (callers then fall back to
    default_calibration_frames)."""
    import os
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "model_data", "calib", "calib_frames.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        frames = np.asarray(z["frames"], np.uint8)
    if frames.ndim != 4 or frames.shape[1] != input_size \
            or frames.shape[2] != input_size:
        return None
    return [frames[i:i + 1] for i in range(frames.shape[0])]


def quantize_for_net(net, params: Dict, images=None,
                     input_size: int = 512,
                     per_channel: bool = False,
                     weight_bits: int = 8) -> Dict:
    """One-call W8A8 quantization for an ACRNet: build the observe
    clone, calibrate activation scales over ``images`` (default: the
    committed real-frame set, falling back to the synthetic
    ``default_calibration_frames``), quantize weights. The single
    entry point shared by ACRPipeline.calibrate and the bench/profile
    builders, so the calibration recipe cannot diverge between the
    serving and benchmarking paths. ``weight_bits=4`` is the W4A8
    experiment ('int4w'): weights snap to 15 levels but still ride the
    int8 conv (values in [-7,7]), so it is exactly as fast as 'int8' —
    measured verdict in docs/PERFORMANCE.md's quantization ledger."""
    if images is None:
        images = committed_calibration_frames(input_size) \
            or default_calibration_frames(input_size)
    stats = calibrate_amax(observe_clone(net), params, images)
    return quantize_tree_int8(params, stats, per_channel=per_channel,
                              weight_bits=weight_bits)


def quantize_tree_int8(params: Dict, stats: Dict,
                       margin: float = 1.0,
                       per_channel: bool = False,
                       weight_bits: int = 8) -> Dict:
    """Float (post-s2d) param tree + observe-run amax stats -> int8 tree.

    Every conv site the observe run touched (key ``amax_<conv_name>``
    at the owning module's path) has its float ``kernel`` replaced with
    {kernel_q, wscale, ascale}; bias and folded-BN params are kept
    (the dequantized output is float, so they apply unchanged).

    ``per_channel=True`` writes a (Ci,) activation-scale vector per
    site and folds its inverse into the kernel BEFORE per-output
    weight quantization (exact; see module docstring). Channels whose
    calibrated amax is far below the site's per-tensor amax are floored
    at 1e-4 of it, bounding the scale disparity so a dead-at-
    calibration channel cannot blow up on real inputs.

    ``weight_bits`` sets the weight grid: 8 -> [-127,127] (default),
    4 -> [-7,7] ('int4w', W4A8). Activations are int8 either way.
    """
    import copy
    qmax = float((1 << (weight_bits - 1)) - 1)
    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    top = params.get("params", params)

    def walk(ptree: Dict, stree: Dict) -> None:
        for key, val in stree.items():
            if key.startswith("amax_"):
                sub = ptree[key[len("amax_"):]]
                if "kernel" not in sub:          # already quantized
                    continue
                k = np.asarray(sub.pop("kernel"), np.float32)
                amax_c = np.asarray(val[0] if isinstance(val, tuple)
                                    else val, np.float32).reshape(-1)
                amax_t = max(float(amax_c.max()) * margin, 1e-12)
                if per_channel:
                    amax_c = np.maximum(amax_c * margin, amax_t * 1e-4)
                    s_c = (127.0 / amax_c).astype(np.float32)   # (Ci,)
                    # fold 1/s_c into the kernel over its input axis
                    k = k / s_c[None, None, :, None]
                    sub["ascale"] = s_c
                else:
                    sub["ascale"] = np.float32(127.0 / amax_t)
                wmax = np.maximum(np.abs(k).reshape(-1, k.shape[-1]).max(0),
                                  1e-12)
                ws = (wmax / qmax).astype(np.float32)
                sub["kernel_q"] = np.clip(
                    np.round(k / ws), -qmax, qmax).astype(np.int8)
                sub["wscale"] = ws
            else:
                walk(ptree[key], val)

    walk(top, stats)
    return jax.tree.map(jnp.asarray, params)
