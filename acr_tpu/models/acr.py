"""ACR network: HRNet backbone + global heads + attention-collaboration part module.

Capability-parity with the reference model (acr/model.py:23-329) in its
demo configuration (inter_prior=True, prior_mode='cross',
offset_mode='concat', attention_mode='pred-part', centermap_size=64):

* global module — per hand (left/right): a params map (106ch), a center
  heatmap (1ch), a camera map (3ch, scale made positive via 1.1**x), and
  a cross-hand prior map (106ch), all at 64x64
  (reference: acr/model.py:68-101,185-202).
* part module — the predicted 33-class part segmentation (256x256)
  becomes 32 spatial attention maps at 128x128; Hadamard attention
  pooling reduces 256-d contact features and 64-d shape features to
  per-part vectors; per-joint locally-connected heads regress 6D pose
  offsets and a Linear head regresses shape; the resulting 109-d vector
  is broadcast to 64x64 and fused with the global params map by a 1x1
  conv over the concatenation (reference: acr/model.py:103-166,204-260).

Everything is NHWC and fixed-shape; the attention pooling is a single
softmax + batched matmul (MXU) instead of reshape/permute chains.

Output maps stay in the COMPUTE dtype. The reference casts every output
map to fp32 (acr/model.py:56-63), but downstream only ever samples one
spatial index per map — materializing fp32 copies of the 33x256x256
segm logits and four 106ch 64x64 maps costs tens of MB of HBM traffic
per frame for nothing in bf16 mode. The parser casts the sampled
(B,109)/(B,106) vectors to fp32 instead (parser/parse.py), and the
fp32 parity mode is bit-unaffected (the casts were no-ops there).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from acr_tpu.models.hrnet import HRNetBackbone, SegmNet
from acr_tpu.models.layers import (
    BasicBlock,
    ConvBN,
    conv,
    downsample_nearest_half,
    get_coord_maps,
)

N_PARTS = 32          # 16 per hand; channel 0 of the segm map is background
PARAMS_CH = 106       # 6D rots (96) + betas (10)
CAM_CH = 3
MAP_SIZE = 64


class HeadStack(nn.Module):
    """stride-2 transition conv + N BasicBlocks + 1x1 output conv.

    The reference `_make_head_layers` (acr/model.py:288-313) for
    centermap_size=64: one k3/s2 conv block then head blocks.
    """
    out_ch: int
    width: int = 64
    num_blocks: int = 2
    dtype: Any = jnp.float32
    pre_transitioned: bool = False   # input already went through the
                                     # merged transition conv (ACRNet)
    quant: str = "none"              # int8 trans/blocks; the 1x1 OUT
                                     # conv (the regressor) stays float
                                     # unless the mode carries '_r'
                                     # (measured experiment, see
                                     # docs/PERFORMANCE.md ledger)

    @nn.compact
    def __call__(self, x):
        from acr_tpu.models.layers import quant_conv
        if not self.pre_transitioned:
            x = ConvBN(self.width, kernel=3, stride=2, use_bias=True,
                       dtype=self.dtype, quant=self.quant, name="trans")(x)
        for k in range(self.num_blocks):
            x = BasicBlock(self.width, dtype=self.dtype, quant=self.quant,
                           name=f"blk{k}")(x)
        out_q = self.quant if self.quant.endswith("_r") else "none"
        return quant_conv(self, x, self.out_ch, 1, pad=0, use_bias=True,
                          dtype=self.dtype, name="out", quant=out_q)


class LocallyConnected(nn.Module):
    """Per-position 1x1 'conv' over a 16x1 joint grid (PARE-style head).

    Unshared weights per joint: out[b,o,j] = sum_c w[o,c,j] * x[b,j,c]
    — one einsum (reference: acr/model.py:541-569 via unfold/broadcast).
    ``x`` is (B, positions, in_ch): in_ch minor keeps the activations
    lane-dense on TPU (a (B,C,16) layout pads 16 -> 128 lanes, 8x).
    The ``w`` param layout (O, C, J) matches the checkpoint converter.
    """
    out_ch: int = 6
    in_ch: int = 256
    positions: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, positions, in_ch)
        w = self.param("w", nn.initializers.normal(1.0),
                       (self.out_ch, self.in_ch, self.positions))
        return jnp.einsum("ocj,bjc->boj", w.astype(self.dtype), x)


def hadamard_pool(features: jnp.ndarray, attention: jnp.ndarray) -> jnp.ndarray:
    """Spatial-softmax attention pooling.

    features (B,H,W,C), attention (B,H,W,J) -> (B,J,C):
    softmax attention over H*W per part, then matmul with features
    (reference: acr/model.py:103-113, which emits (B,C,J); the
    transposed layout keeps C=256 on the TPU lane dim — J=32 minor
    would pad 4x and measured 12 TFLOP/s).
    """
    b, h, w, c = features.shape
    j = attention.shape[-1]
    att = jax.nn.softmax(attention.reshape(b, h * w, j), axis=1)
    feat = features.reshape(b, h * w, c)
    return jnp.einsum("bpj,bpc->bjc", att, feat)


class ACRNet(nn.Module):
    """Full-frame network: uint8 image (B,512,512,3) -> output maps dict.

    ``params_ch`` is the per-hand parameter-map width without the camera
    (cfg.map_channels; 106 for the 6D demo layout). ``offset_mode``
    selects how the part module's pooled 106-vector refines the global
    params map: 'concat' (1x1 conv over the concatenation — the only
    mode the reference's forward implements, acr/model.py:158-164,
    254-258), 'offset' (add to the map's non-cam channels), or
    'replace' (overwrite them) — the PARE-style semantics the
    reference's flag names but never wired.
    """
    dtype: Any = jnp.float32
    inter_prior: bool = True
    head_block_num: int = 2
    params_ch: int = PARAMS_CH
    offset_mode: str = "concat"
    # exact space-to-depth rewrites (TPU lane utilization; all need
    # transform_params_s2d'd params — models/s2d.py)
    s2d_highres: bool = False    # HRNet high-res branch
    s2d_segm: bool = False       # segmentation head
    s2d_stem: bool = False       # packed uint8 input / stem1
    merged_heads: bool = False   # one dense 512ch transition conv for
                                 # all 8 head stacks (64ch each = half
                                 # lane occupancy); exact via load-time
                                 # weight concat (s2d.transform)
    quantize: str = "none"       # 'int8': W8A8 convs in the backbone,
                                 # segm head, head trans/blocks and the
                                 # part-module feature convs (2x MXU on
                                 # v5e; APPROXIMATE — ops/quant.py);
                                 # 'observe': float run sowing per-conv
                                 # input amax for calibration. The
                                 # regressors (per-head 1x1 out convs,
                                 # fuse convs, LocallyConnected/Dense)
                                 # and the parser/MANO tail stay float;
                                 # 'int8_r' additionally quantizes the
                                 # out/fuse regressor convs (measured
                                 # experiment — docs/PERFORMANCE.md
                                 # negative-results ledger).

    @nn.compact
    def __call__(self, image_uint8: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats = HRNetBackbone(dtype=self.dtype, s2d0=self.s2d_highres,
                              s2d_stem=self.s2d_stem, quant=self.quantize,
                              name="backbone")(image_uint8)
        segm_raw = SegmNet(dtype=self.dtype, s2d=self.s2d_segm,
                           quant=self.quantize, name="segm")(feats)
        if self.s2d_segm:
            # packed (B,128,128,132): phase (0,0) channels ARE the
            # 256->128 nearest downsample, so the part attention is a
            # channel slice; the full-res logits unpack only for output
            from acr_tpu.models.layers import depth_to_space2
            att_src = segm_raw[..., :N_PARTS + 1]
            pred_segm = depth_to_space2(segm_raw)            # (B,256,256,33)
        else:
            att_src = downsample_nearest_half(segm_raw)      # (B,128,128,33)
            pred_segm = segm_raw

        coords = get_coord_maps(feats.shape[1], self.dtype)
        x = jnp.concatenate(
            [feats, jnp.broadcast_to(coords, feats.shape[:3] + (2,))], axis=-1)

        # ---- global module (per hand) ----
        kinds = ("params", "center", "cam") + (
            ("prior",) if self.inter_prior else ())
        pre = None
        if self.merged_heads:
            # the per-head k3/s2 transition convs all read the same x
            # and emit 64ch (half lane occupancy); one dense conv over
            # the concatenated output axis is the same math. NOTE:
            # merging the per-head 1x1 OUT convs the same way was
            # measured and REVERTED — concatenating the 8 block outputs
            # puts half the heads at 64-lane (half-tile) offsets, and
            # the resulting read-modify-write stores cost more
            # (+0.32 ms) than the merged out conv saved (-0.23 ms).
            head_names = [f"{s}_{k}" for s in ("l", "r") for k in kinds]
            t = ConvBN(64 * len(head_names), kernel=3, stride=2,
                       use_bias=True, dtype=self.dtype, quant=self.quantize,
                       name="heads_trans")(x)
            pre = {nm: t[..., i * 64:(i + 1) * 64]
                   for i, nm in enumerate(head_names)}

        def head_stack(side: str, kind: str, out_ch: int):
            nm = f"{side}_{kind}"
            if pre is not None:
                return HeadStack(out_ch, num_blocks=self.head_block_num,
                                 pre_transitioned=True, dtype=self.dtype,
                                 quant=self.quantize,
                                 name=f"{nm}_head")(pre[nm])
            return HeadStack(out_ch, num_blocks=self.head_block_num,
                             dtype=self.dtype, quant=self.quantize,
                             name=f"{nm}_head")(x)

        def global_maps(side: str):
            params = head_stack(side, "params", self.params_ch)
            center = head_stack(side, "center", 1)
            cam = head_stack(side, "cam", CAM_CH)
            prior = None
            if self.inter_prior:
                prior = head_stack(side, "prior", self.params_ch)
            # positive scale via 1.1^s (reference: acr/model.py:95-96)
            cam = jnp.concatenate(
                [jnp.power(1.1, cam[..., :1]), cam[..., 1:]], axis=-1)
            return jnp.concatenate([cam, params], axis=-1), center, prior

        l_params, l_center, l_prior = global_maps("l")
        r_params, r_center, r_prior = global_maps("r")

        # ---- part (attention-collaboration) module ----
        # 256->128 nearest downsample, drop background channel
        part_att = att_src[..., 1:]                                  # (B,128,128,32)

        from acr_tpu.models.layers import quant_conv
        contact_feats = ConvBN(256, kernel=3, use_bias=True, dtype=self.dtype,
                               quant=self.quantize,
                               name="contact_conv")(x)               # (B,128,128,256)
        shape_feats = quant_conv(self, contact_feats, 64, 1, pad=0,
                                 use_bias=True, dtype=self.dtype,
                                 name="cam_shape_conv",
                                 quant=self.quantize)                # (B,128,128,64)

        pooled_contact = hadamard_pool(contact_feats, part_att)      # (B,32,256)
        pooled_shape = hadamard_pool(shape_feats, part_att)          # (B,32,64)

        # parts 0..15 are RIGHT, 16..31 LEFT (reference: acr/model.py:141-146)
        per_side = {
            "r": (pooled_contact[:, :16, :], pooled_shape[:, :16, :]),
            "l": (pooled_contact[:, 16:, :], pooled_shape[:, 16:, :]),
        }

        pose_w = self.params_ch - 10                 # 96 for the 6D layout
        per_joint = pose_w // 16

        def part_refine(side: str, params_map: jnp.ndarray) -> jnp.ndarray:
            contact, shape = per_side[side]
            b = contact.shape[0]
            # (B,6,16) -> per-joint-contiguous 96-vector [(j0 6d), (j1 6d), ...]
            offs = LocallyConnected(out_ch=per_joint, dtype=self.dtype,
                                    name=f"{side}_pose_lc")(contact)
            offs = offs.transpose(0, 2, 1).reshape(b, pose_w)
            # flatten channel-major (c outer, j inner), matching torch
            # flatten order; shape is (B,16,64) in the lane-dense layout
            shape_flat = shape.transpose(0, 2, 1).reshape(b, 64 * 16)
            betas = nn.Dense(10, dtype=self.dtype,
                             name=f"{side}_shape_fc")(shape_flat)
            pare = jnp.concatenate([offs, betas], axis=-1)           # (B,106)
            mh, mw = params_map.shape[1:3]
            pare_bcast = jnp.broadcast_to(
                pare[:, None, None, :], (b, mh, mw, self.params_ch))
            if self.offset_mode == "offset":
                return jnp.concatenate(
                    [params_map[..., :CAM_CH],
                     params_map[..., CAM_CH:] + pare_bcast], axis=-1)
            if self.offset_mode == "replace":
                return jnp.concatenate(
                    [params_map[..., :CAM_CH], pare_bcast], axis=-1)
            pare_map = jnp.concatenate(
                [params_map[..., :CAM_CH], pare_bcast], axis=-1)     # (B,64,64,109)
            fused_in = jnp.concatenate([params_map, pare_map], axis=-1)
            fuse_q = self.quantize if self.quantize.endswith("_r") else "none"
            return quant_conv(self, fused_in, CAM_CH + self.params_ch, 1,
                              pad=0, use_bias=True, dtype=self.dtype,
                              name=f"{side}_fuse_conv", quant=fuse_q)

        l_params = part_refine("l", l_params)
        r_params = part_refine("r", r_params)

        # maps stay in compute dtype — see module docstring (the parser
        # casts the sampled vectors; parity fp32 mode is unaffected)
        return {
            "l_params_maps": l_params,
            "r_params_maps": r_params,
            "l_center_map": l_center,
            "r_center_map": r_center,
            "l_prior_maps": l_prior,
            "r_prior_maps": r_prior,
            "segms": pred_segm,
        }
