"""HRNet-W32-style backbone in flax (NHWC, inference-folded BN).

Capability-parity with the reference ``HigherResolutionNet``
(reference: acr/model.py:571-881): stem of two stride-2 3x3 convs, a
4-Bottleneck layer1, then three multi-resolution stages
(1 module / 2 branches, 4 modules / 3 branches, 3 modules / 4 branches,
channels [32, 64, 128, 256]) with all-to-all SUM fusion; returns the
highest-resolution branch — (B, 128, 128, 32) for a 512x512 input.
Input normalization ``(x / 255) * 2 - 1`` lives inside the module like
the reference (acr/model.py:832), so callers feed raw uint8 frames.

TPU-first notes: NHWC layout (native for XLA:TPU convs), optional bf16
compute dtype, coarse->fine fusion via nearest ``jnp.repeat`` upsample
(layout-preserving broadcast, not gather).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from acr_tpu.models.layers import (
    BasicBlock,
    Bottleneck,
    ConvBN,
    depth_to_space2,
    upsample_nearest,
)

STAGE2 = {"num_modules": 1, "channels": (32, 64), "num_blocks": 4}
STAGE3 = {"num_modules": 4, "channels": (32, 64, 128), "num_blocks": 4}
STAGE4 = {"num_modules": 3, "channels": (32, 64, 128, 256), "num_blocks": 4}


class HRModule(nn.Module):
    """Parallel multi-resolution branches + all-to-all SUM fuse.

    Branch i runs ``num_blocks`` BasicBlocks at channels[i]; fusion sends
    every branch j to every output branch i (1x1 conv + nearest x2^(j-i)
    upsample for coarse->fine, a chain of stride-2 3x3 convs for
    fine->coarse), summed then ReLU'd
    (reference: acr/model.py:571-686).
    """
    channels: Sequence[int]
    num_blocks: int = 4
    multi_scale_output: bool = True
    dtype: Any = jnp.float32
    s2d0: bool = False     # branch 0 carried in space-to-depth form (models/s2d.py)
    quant: str = "none"    # int8 conv path / calibration (ops/quant.py)

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        n = len(self.channels)
        # branches; with s2d0, branch 0 runs 4x channels at half spatial
        # on weights transformed by transform_params_s2d — same math,
        # full 128-lane utilization (models/s2d.py)
        ys = []
        for i in range(n):
            h = xs[i]
            width = self.channels[i] * (4 if (i == 0 and self.s2d0) else 1)
            for k in range(self.num_blocks):
                h = BasicBlock(width, dtype=self.dtype, quant=self.quant,
                               name=f"b{i}_{k}")(h)
            ys.append(h)
        if n == 1:
            return ys

        n_out = n if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(n):
                if j == i:
                    contrib = ys[j]
                elif j > i:
                    if i == 0 and self.s2d0:
                        # nearest x2 makes all four phases of a cell
                        # equal, so the packed contribution is the 32ch
                        # one tiled x4 phase-major — fold that tile into
                        # the 1x1 conv (weights tiled on the output
                        # axis, transform_params_s2d) instead of
                        # materializing 32ch + a tile op — exact
                        contrib = ConvBN(self.channels[i] * 4, kernel=1,
                                         relu=False, dtype=self.dtype,
                                         quant=self.quant,
                                         name=f"fuse_{i}_{j}")(ys[j])
                        contrib = upsample_nearest(contrib, 2 ** (j - 1))
                    else:
                        contrib = ConvBN(self.channels[i], kernel=1,
                                         relu=False, dtype=self.dtype,
                                         quant=self.quant,
                                         name=f"fuse_{i}_{j}")(ys[j])
                        contrib = upsample_nearest(contrib, 2 ** (j - i))
                else:
                    contrib = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        feats = self.channels[i] if last else self.channels[j]
                        if j == 0 and k == 0 and self.s2d0:
                            # stride-2 conv out of the packed branch ==
                            # 2x2 stride-1 macro conv, pad ((1,0),(1,0))
                            contrib = ConvBN(feats, kernel=2, stride=1,
                                             padding=((1, 0), (1, 0)),
                                             relu=not last, dtype=self.dtype,
                                             quant=self.quant,
                                             name=f"fuse_{i}_{j}_{k}")(contrib)
                        else:
                            contrib = ConvBN(feats, kernel=3, stride=2,
                                             relu=not last, dtype=self.dtype,
                                             quant=self.quant,
                                             name=f"fuse_{i}_{j}_{k}")(contrib)
                acc = contrib if acc is None else acc + contrib
            fused.append(nn.relu(acc))
        return fused


class _PaddedOutBlock(nn.Module):
    """ConvBN with lane-padded evaluation (layers.LanePaddedConv)."""
    features: int
    in_features: int
    lanes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from acr_tpu.models.layers import LanePaddedBN, LanePaddedConv
        x = LanePaddedConv(self.features, self.in_features, lanes=self.lanes,
                           use_bias=True, dtype=self.dtype, name="conv")(x)
        x = LanePaddedBN(self.features, lanes=self.lanes, dtype=self.dtype,
                         name="bn")(x)
        return nn.relu(x)


class SegmNet(nn.Module):
    """Part-segmentation head: 128 -> 256 upsample, 33-class logits.

    bilinear x2 (align_corners) -> DoubleConv(32 -> 16 -> 64) ->
    truncated DoubleConv(64 -> 33 -> 33)
    (reference: acr/model.py:374-463; SegmHead(32, 128, 64, 33)).

    ``lanes`` optionally evaluates the two 33-channel output convs at a
    padded lane count with zero-padded weights, sliced back to 33 —
    bit-exact, canonical checkpoint shapes. Measured in the full 512px
    program on a v5e this LOSES ~0.5 ms/batch-8 (XLA already handles
    the odd channel count well in context, and padding adds bytes), so
    the default is None; the option remains for other shapes/hardware
    (tests/test_s2d.py covers it).

    ``s2d=True`` runs the whole head in 2x2 space-to-depth form: the
    upsample emits packed phases directly (layers.resize_bilinear_x2_s2d)
    and every conv becomes a 4x-channel macro conv on weights
    transformed by ``transform_params_s2d`` — exact, and it turns the
    head's 16/64/33-channel 256x256 convs (1/8-1/4 lane occupancy, the
    slowest category left after the backbone rewrite) into dense
    64/256/132-channel 128x128 work. Returns the PACKED (B,H,W,4*33)
    logits; the caller unpacks with ``depth_to_space2`` (and gets the
    part-attention 128x128 nearest-downsample for free as channels
    [0:33], which are exactly phase (0,0)).
    """
    out_dim: int = 33
    dtype: Any = jnp.float32
    lanes: Optional[int] = None    # e.g. 64: lane-padded out convs
    s2d: bool = False              # space-to-depth macro-conv form
    quant: str = "none"            # int8 conv path (ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from acr_tpu.models.layers import (
            LanePaddedConv, conv, resize_bilinear_align_corners,
            resize_bilinear_x2_s2d)
        if self.s2d:
            assert self.lanes is None, "s2d and lanes are exclusive"
            x = resize_bilinear_x2_s2d(x)                   # (B,H,W,4*32)
            x = ConvBN(16 * 4, kernel=3, use_bias=True, dtype=self.dtype,
                       quant=self.quant, name="up1")(x)
            x = ConvBN(64 * 4, kernel=3, use_bias=True, dtype=self.dtype,
                       quant=self.quant, name="up2")(x)
            # the two out convs run at 256 lanes: 132 (= 4*33) straddles
            # the 128-lane boundary — profiled at 13% MXU vs 81% for the
            # dense up2. Channels 132..255 are structural zeros (zero
            # weight columns/rows, zero bias; ReLU keeps them zero), so
            # the slice back to 132 is exact (transform_params_s2d pads).
            x = ConvBN(256, kernel=3, use_bias=True, quant=self.quant,
                       dtype=self.dtype, name="out1")(x)
            from acr_tpu.models.layers import quant_conv
            x = quant_conv(self, x, 256, 3, use_bias=True, dtype=self.dtype,
                           name="out_conv2", quant=self.quant)
            return x[..., :self.out_dim * 4]                # packed logits
        h, w = x.shape[1], x.shape[2]
        x = resize_bilinear_align_corners(x, (h * 2, w * 2))
        # Up.conv = DoubleConv(in=32, out=64, mid=in//2=16)
        x = ConvBN(16, kernel=3, use_bias=True, dtype=self.dtype,
                   quant=self.quant, name="up1")(x)
        x = ConvBN(64, kernel=3, use_bias=True, dtype=self.dtype,
                   quant=self.quant, name="up2")(x)
        # segm_net = DoubleConv(64, 33) truncated to [conv, bn, relu, conv];
        # optionally lane-padded 33 -> lanes through both convs, sliced
        if self.lanes is None:
            x = ConvBN(self.out_dim, kernel=3, use_bias=True,
                       dtype=self.dtype, quant=self.quant, name="out1")(x)
            from acr_tpu.models.layers import quant_conv
            return quant_conv(self, x, self.out_dim, 3, use_bias=True,
                              dtype=self.dtype, name="out_conv2",
                              quant=self.quant)
        x = _PaddedOutBlock(self.out_dim, in_features=64, lanes=self.lanes,
                            dtype=self.dtype, name="out1")(x)
        x = LanePaddedConv(self.out_dim, in_features=self.out_dim,
                           lanes=self.lanes, use_bias=True, dtype=self.dtype,
                           name="out_conv2")(x)
        return x[..., :self.out_dim]


class HRNetBackbone(nn.Module):
    """Stem + layer1 + 3 multi-resolution stages; returns (B,128,128,32).

    ``s2d0=True`` carries the high-resolution branch in 2x2
    space-to-depth form between transition1 and the final output —
    an exact rewrite that turns its 32-channel convs into 128-channel
    ones (quarter-lane -> full-lane MXU work; see models/s2d.py).
    Requires params passed through ``transform_params_s2d``.
    """
    dtype: Any = jnp.float32
    s2d0: bool = False
    s2d_stem: bool = False
    quant: str = "none"            # int8 conv path (ops/quant.py)

    @nn.compact
    def __call__(self, image_uint8: jnp.ndarray) -> jnp.ndarray:
        if self.s2d_stem:
            # profiled: the (B,512,512,3) normalized tensor and stem1's
            # 3-input-channel conv ran at 2.7% MXU — a 3-channel minor
            # dim lane-pads to 128 in HBM tiling (~42x wasted bytes),
            # and a 2x2 space-to-depth pack pays a 0.83 ms/step
            # transpose. W-ONLY packing (B,S,S,3)->(B,S,S/4,12) is a
            # FREE row-major reshape; stem1 consumes the 4-packed rows
            # and emits W-packed-by-2 output, and stem2 folds the
            # unpack into its stride (s2d.wpack_strided_conv3_weights)
            # — exact, landing on the canonical 128px/64ch grid.
            b, s = image_uint8.shape[0], image_uint8.shape[1]
            x = image_uint8.reshape(b, s, s // 4, 12)
            x = x.astype(self.dtype) / 255.0 * 2.0 - 1.0
            x = ConvBN(64 * 2, kernel=(3, 2), stride=(2, 1),
                       padding=((1, 1), (1, 0)), dtype=self.dtype,
                       quant=self.quant, name="stem1")(x)
            x = ConvBN(64, kernel=(3, 2), stride=(2, 1),
                       padding=((1, 1), (1, 0)), dtype=self.dtype,
                       quant=self.quant, name="stem2")(x)
        else:
            x = image_uint8.astype(self.dtype) / 255.0 * 2.0 - 1.0
            x = ConvBN(64, kernel=3, stride=2, dtype=self.dtype,
                       quant=self.quant, name="stem1")(x)
            x = ConvBN(64, kernel=3, stride=2, dtype=self.dtype,
                       quant=self.quant, name="stem2")(x)
        for k in range(4):
            x = Bottleneck(64, downsample=(k == 0), dtype=self.dtype,
                           quant=self.quant, name=f"layer1_{k}")(x)          # -> 256 ch, /4

        # transition1: 256 -> [32 (same res), 64 (stride 2)]
        if self.s2d0:
            # pack folded into the conv: 4x4/s2 macro kernel emits the
            # space_to_depth2 form directly (s2d_pack_out_conv3_weights)
            # — dense 128-lane MXU work, no relayout op
            x0 = ConvBN(32 * 4, kernel=4, stride=2,
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        quant=self.quant, name="transition1_0")(x)
        else:
            x0 = ConvBN(32, kernel=3, dtype=self.dtype, quant=self.quant,
                        name="transition1_0")(x)
        xs = [
            x0,
            ConvBN(64, kernel=3, stride=2, dtype=self.dtype,
                   quant=self.quant, name="transition1_1_0")(x),
        ]
        for m in range(STAGE2["num_modules"]):
            xs = HRModule(STAGE2["channels"], dtype=self.dtype,
                          s2d0=self.s2d0, quant=self.quant,
                          name=f"stage2_{m}")(xs)

        xs = xs + [ConvBN(128, kernel=3, stride=2, dtype=self.dtype,
                          quant=self.quant,
                          name="transition2_2_0")(xs[-1])]
        for m in range(STAGE3["num_modules"]):
            xs = HRModule(STAGE3["channels"], dtype=self.dtype,
                          s2d0=self.s2d0, quant=self.quant,
                          name=f"stage3_{m}")(xs)

        xs = xs + [ConvBN(256, kernel=3, stride=2, dtype=self.dtype,
                          quant=self.quant,
                          name="transition3_3_0")(xs[-1])]
        for m in range(STAGE4["num_modules"]):
            last = m == STAGE4["num_modules"] - 1
            xs = HRModule(STAGE4["channels"], multi_scale_output=not last,
                          dtype=self.dtype, s2d0=self.s2d0,
                          quant=self.quant, name=f"stage4_{m}")(xs)
        return depth_to_space2(xs[0]) if self.s2d0 else xs[0]
