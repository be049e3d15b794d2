"""Building-block modules for the ACR network, in flax/NHWC.

Inference-first design decisions (vs the reference torch modules,
acr/model.py:415-569):

* BatchNorm is a folded affine (`FoldedBN`): the checkpoint converter
  precomputes ``scale = gamma / sqrt(running_var + eps)`` and
  ``bias = beta - running_mean * scale``, so at runtime BN is one
  multiply-add that XLA fuses into the preceding conv.
* All convs use explicit torch-style padding numbers so spatial
  semantics match the reference exactly (XLA 'SAME' distributes
  stride-2 padding differently than torch's symmetric pad=1).
* align_corners=True bilinear upsampling is expressed as two small
  interpolation-matrix matmuls (MXU-friendly, exactly matches
  ``F.interpolate(..., mode='bilinear', align_corners=True)``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class FoldedBN(nn.Module):
    """Inference BatchNorm folded to a per-channel affine."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def conv(features: int, kernel: int, stride: int = 1, pad: Optional[int] = None,
         use_bias: bool = False, name: Optional[str] = None,
         dtype: Any = jnp.float32,
         padding: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
         ) -> nn.Conv:
    """Torch-semantics Conv2d: explicit symmetric padding (default k//2).

    ``padding`` overrides with an explicit asymmetric spec (used by the
    space-to-depth macro convs, which need ((1,0),(1,0))). ``kernel``
    and ``stride`` accept (kh, kw) tuples for anisotropic macro convs
    (the W-packed stem)."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(stride, int):
        stride = (stride, stride)
    if padding is None:
        if pad is None:
            pad = kernel[0] // 2
        padding = ((pad, pad), (pad, pad))
    return nn.Conv(features, kernel, strides=stride,
                   padding=padding, use_bias=use_bias,
                   dtype=dtype, name=name)


def quant_conv(parent: nn.Module, x, features: int, kernel=3, stride=1,
               pad: Optional[int] = None, padding=None, use_bias: bool = False,
               name: str = "conv", dtype: Any = jnp.float32,
               quant: str = "none"):
    """Conv call site with an optional int8 path (ops/quant.py).

    quant='none': the plain float conv. quant='observe' (any variant):
    float conv, but first sow the input per-channel amax into the
    ``quant_stats`` collection (calibration pass; per-tensor consumers
    reduce with .max()). quant='int8'/'int8_pc'/'int8_r'/'int4w': the
    QuantConv with params {kernel_q, wscale, ascale} under the same
    module name ('_pc' = per-input-channel activation scales; '_r'
    additionally routes the regressor call sites here; 'int4w' = int4
    weight grid riding the same int8 conv — ops/quant.py).
    """
    if quant.startswith("observe"):
        parent.sow("quant_stats", f"amax_{name}",
                   jnp.max(jnp.abs(x.astype(jnp.float32)),
                           axis=tuple(range(x.ndim - 1))))
    if quant.startswith(("int8", "int4")):
        from acr_tpu.ops.quant import QuantConv
        return QuantConv(features, kernel=kernel, stride=stride, pad=pad,
                         padding=padding, use_bias=use_bias, dtype=dtype,
                         per_channel=quant.endswith("_pc"), name=name)(x)
    return conv(features, kernel, stride, pad=pad, padding=padding,
                use_bias=use_bias, dtype=dtype, name=name)(x)


class ConvBN(nn.Module):
    """conv -> folded BN -> optional ReLU."""
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32
    padding: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None
    quant: str = "none"        # 'none' | 'observe' | 'int8' (ops/quant.py)

    @nn.compact
    def __call__(self, x):
        x = quant_conv(self, x, self.features, self.kernel, self.stride,
                       use_bias=self.use_bias, dtype=self.dtype, name="conv",
                       padding=self.padding, quant=self.quant)
        x = FoldedBN(self.features, dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    """Residual basic block (reference: acr/model.py:470-499)."""
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        residual = x
        out = quant_conv(self, x, self.features, 3, self.stride,
                         dtype=self.dtype, name="conv1", quant=self.quant)
        out = FoldedBN(self.features, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = quant_conv(self, out, self.features, 3, 1, dtype=self.dtype,
                         name="conv2", quant=self.quant)
        out = FoldedBN(self.features, dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            residual = quant_conv(self, x, self.features, 1, self.stride,
                                  pad=0, dtype=self.dtype, name="down_conv",
                                  quant=self.quant)
            residual = FoldedBN(self.features, dtype=self.dtype, name="down_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """Residual bottleneck, expansion 4 (reference: acr/model.py:501-539)."""
    features: int            # inner width; output = 4 * features
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    quant: str = "none"
    EXPANSION: int = 4

    @nn.compact
    def __call__(self, x):
        out_feats = self.features * self.EXPANSION
        residual = x
        out = quant_conv(self, x, self.features, 1, 1, pad=0,
                         dtype=self.dtype, name="conv1", quant=self.quant)
        out = FoldedBN(self.features, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = quant_conv(self, out, self.features, 3, self.stride,
                         dtype=self.dtype, name="conv2", quant=self.quant)
        out = FoldedBN(self.features, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = quant_conv(self, out, out_feats, 1, 1, pad=0,
                         dtype=self.dtype, name="conv3", quant=self.quant)
        out = FoldedBN(out_feats, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            residual = quant_conv(self, x, out_feats, 1, self.stride, pad=0,
                                  dtype=self.dtype, name="down_conv",
                                  quant=self.quant)
            residual = FoldedBN(out_feats, dtype=self.dtype, name="down_bn")(residual)
        return nn.relu(out + residual)


class LanePaddedConv(nn.Module):
    """Conv evaluated at ``lanes`` output channels via zero-padded weights.

    XLA:TPU runs a 33-output-channel conv ~4x slower than a 64-channel
    one (profiled on the segm head: 599us vs ~150us — 33 lanes of the
    128-lane VPU/MXU tile). Padding the WEIGHTS with zero output
    channels (and zero rows for any lane-padded input channels) is
    bit-exact: the extra outputs are zeros the caller slices off.
    Parameter shapes stay canonical, so checkpoints are untouched.
    """
    features: int            # canonical out channels
    in_features: int         # canonical in channels
    lanes: int = 64
    kernel: int = 3
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):   # x may itself be lane-padded beyond in_features
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel,
                        self.in_features, self.features))
        pad_in = x.shape[-1] - self.in_features
        pad_out = self.lanes - self.features
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_in), (0, pad_out)))
        p = self.kernel // 2
        y = jax.lax.conv_general_dilated(
            x, kp.astype(self.dtype), (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + jnp.pad(b, (0, pad_out)).astype(self.dtype)
        return y


class LanePaddedBN(nn.Module):
    """FoldedBN over a lane-padded tensor; canonical param shapes."""
    features: int
    lanes: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.lanes - self.features
        return (x * jnp.pad(scale, (0, pad)).astype(self.dtype)
                + jnp.pad(bias, (0, pad)).astype(self.dtype))


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index = (pi*2+pj)*C + c
    for pixel phase (pi, pj) within each 2x2 cell."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth2."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC nearest-neighbor upsample by an integer factor."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def downsample_nearest_half(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest downsample by 2 (torch F.interpolate(scale=0.5, 'nearest'))."""
    return x[:, ::2, ::2, :]


@functools.lru_cache(maxsize=32)
def _align_corners_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) linear interpolation matrix with align_corners=True."""
    m = np.zeros((dst, src), np.float32)
    if dst == 1 or src == 1:
        m[:, 0] = 1.0
        return m
    pos = np.arange(dst) * (src - 1) / (dst - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    w = (pos - lo).astype(np.float32)
    m[np.arange(dst), lo] += 1.0 - w
    m[np.arange(dst), hi] += w
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize matching torch align_corners=True.

    Separable: two interpolation-matrix contractions that run on the MXU
    instead of gathers.
    """
    h2, w2 = out_hw
    ah = jnp.asarray(_align_corners_matrix(x.shape[1], h2), x.dtype)
    aw = jnp.asarray(_align_corners_matrix(x.shape[2], w2), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", ah, x)
    return jnp.einsum("pw,bwoc->bpoc", aw, x.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)


def resize_bilinear_x2_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """align_corners x2 bilinear upsample, emitted in space-to-depth form.

    Equals ``space_to_depth2(resize_bilinear_align_corners(x, (2H, 2W)))``
    without materializing the (B, 2H, 2W, C) intermediate: the even/odd
    output rows/cols come from row-sliced interpolation matrices, so each
    2x2 phase is its own pair of MXU matmuls and the four phases
    concatenate channel-major ((pi*2+pj)*C + c — the space_to_depth2
    convention). Feeds the s2d segm head (models/s2d.py).
    """
    b, h, w, c = x.shape
    ah = _align_corners_matrix(h, 2 * h)
    aw = _align_corners_matrix(w, 2 * w)
    outs = []
    for pi in range(2):
        m_h = jnp.asarray(ah[pi::2], x.dtype)
        y_rows = jnp.einsum("oh,bhwc->bowc", m_h, x)
        for pj in range(2):
            m_w = jnp.asarray(aw[pj::2], x.dtype)
            outs.append(jnp.einsum("pw,bowc->bopc", m_w, y_rows))
    return jnp.concatenate(outs, axis=-1)


def get_coord_maps(size: int = 128, dtype=jnp.float32) -> jnp.ndarray:
    """(1, size, size, 2) CoordConv xy grid in [-1, 1].

    Channel 0 varies along width (x), channel 1 along height (y)
    (reference: acr/model.py:340-369).
    """
    r = np.arange(size, dtype=np.float32) / (size - 1) * 2 - 1
    xx = np.tile(r[None, :], (size, 1))
    yy = np.tile(r[:, None], (1, size))
    out = np.stack([xx, yy], axis=-1)[None]
    return jnp.asarray(out, dtype)
