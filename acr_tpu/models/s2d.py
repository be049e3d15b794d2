"""Space-to-depth rewrite of HRNet's high-resolution branch.

Why: profiling the 512px program on a v5e showed the branch-0 convs
(128x128 spatial, 32 channels) consuming ~49% of device time at ~9% MXU
utilization — 32 channels fill a quarter of the TPU's 128 vector lanes,
so both the MXU contraction and every HBM tile are 3/4 padding. Dense
256-channel convs in the same program measure ~74% MXU.

The fix is an EXACT algebraic rewrite, not an approximation: carry
branch-0 activations in 2x2 space-to-depth form — (B, 64, 64, 128)
instead of (B, 128, 128, 32), channel index (pi*2+pj)*C + c — and
transform the conv weights so every op computes bit-for-bit the same
function (up to float reassociation):

* 3x3 stride-1 conv  ->  3x3 stride-1 "macro" conv on the packed
  tensor with weights W'[kI,kJ,(p,ci),(q,co)] = W[di,dj,ci,co] where
  di = 2*kI + pi - qi - 1 (zero where di/dj fall outside [0,2]).
  FLOPs grow 4x (the macro kernel is half structural zeros), but the
  MXU absorbs dense 128-lane work ~8x faster than 32-lane work.
* 3x3 stride-2 conv out of the branch (fuse-down paths) -> 2x2
  stride-1 macro conv with padding ((1,0),(1,0)) and weights
  W'[kI,kJ,(p,ci),co] = W[di,dj,ci,co], di = 2*kI + pi - 1.
* folded-BN scale/bias -> tiled 4x (phase-major, matching the packing).
* nearest x2 upsample INTO the branch -> channel tile by 4 (all four
  phases of a nearest-upsampled pixel are equal).

Checkpoints stay in canonical (reference-shaped) form; the transform
runs once at load time (``transform_params_s2d``). The torch-parity
harness exercises the canonical module; tests/test_s2d.py pins
canonical-vs-s2d equality at the conv, module, and backbone level.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

# fuse_0_<j> (coarse->fine 1x1 into branch 0), NOT fuse_i_0_0 chains
_FUSE_INTO_B0 = re.compile(r"fuse_0_\d+$")


def s2d_conv3_weights(w: np.ndarray) -> np.ndarray:
    """(3,3,C,Co) stride-1 kernel -> (3,3,4C,4Co) macro kernel."""
    kh, kw, c, co = w.shape
    assert (kh, kw) == (3, 3), w.shape
    out = np.zeros((3, 3, 4 * c, 4 * co), w.dtype)
    for k_i in range(3):
        for k_j in range(3):
            for pi in range(2):
                for pj in range(2):
                    for qi in range(2):
                        for qj in range(2):
                            di = 2 * k_i + pi - qi - 1
                            dj = 2 * k_j + pj - qj - 1
                            if 0 <= di < 3 and 0 <= dj < 3:
                                p = pi * 2 + pj
                                q = qi * 2 + qj
                                out[k_i, k_j, p * c:(p + 1) * c,
                                    q * co:(q + 1) * co] = w[di, dj]
    return out


def s2d_strided_conv3_weights(w: np.ndarray) -> np.ndarray:
    """(3,3,C,Co) stride-2 kernel -> (2,2,4C,Co) stride-1 macro kernel
    (use with explicit padding ((1,0),(1,0)))."""
    kh, kw, c, co = w.shape
    assert (kh, kw) == (3, 3), w.shape
    out = np.zeros((2, 2, 4 * c, co), w.dtype)
    for k_i in range(2):
        for k_j in range(2):
            for pi in range(2):
                for pj in range(2):
                    di = 2 * k_i + pi - 1
                    dj = 2 * k_j + pj - 1
                    if 0 <= di < 3 and 0 <= dj < 3:
                        p = pi * 2 + pj
                        out[k_i, k_j, p * c:(p + 1) * c, :] = w[di, dj]
    return out


def s2d_pack_out_conv3_weights(w: np.ndarray) -> np.ndarray:
    """(3,3,C,Co) stride-1 kernel -> (4,4,C,4Co) stride-2 macro kernel
    whose output IS the space_to_depth2 packing of the original conv's
    output (use with explicit padding ((1,1),(1,1))).

    Output phase (pi,pj) of macro cell (m_i,m_j) is the original conv at
    pixel (2m_i+pi, 2m_j+pj), whose 3x3 window rows 2m_i+pi-1..+1 sit
    inside the macro window rows 2m_i-1..+2 at offset pi:
    W'[kI,kJ,ci,(pi*2+pj)*Co+co] = W[kI-pi, kJ-pj, ci, co]
    (zero where out of range). Folding the packing into the conv turns a
    32-lane 128x128 conv into a dense 128-lane 64x64 one AND deletes the
    relayout op.
    """
    kh, kw, c, co = w.shape
    assert (kh, kw) == (3, 3), w.shape
    out = np.zeros((4, 4, c, 4 * co), w.dtype)
    for k_i in range(4):
        for k_j in range(4):
            for pi in range(2):
                for pj in range(2):
                    di, dj = k_i - pi, k_j - pj
                    if 0 <= di < 3 and 0 <= dj < 3:
                        p = pi * 2 + pj
                        out[k_i, k_j, :, p * co:(p + 1) * co] = w[di, dj]
    return out


def wpack_strided_conv3_weights(w: np.ndarray, pack_in: int,
                                pack_out: int) -> np.ndarray:
    """(3,3,C,Co) stride-2 kernel -> (3,2, pack_in*C, pack_out*Co) macro
    kernel on W-only-packed activations (stride (2,1), padding
    ((1,1),(1,0))); requires ``pack_in == 2*pack_out``.

    W-only packing (B,H,W,C) -> (B,H,W/P,P*C), channel = phase*C + c,
    is a FREE row-major reshape — no transpose, unlike the 2x2
    space-to-depth pack. Output phase q of macro cell w is the original
    stride-2 output at x' = pack_out*w + q; its tap t reads original
    x = pack_in*w + 2q - 1 + t, i.e. macro cell w + (2q-1+t)//pack_in
    (kernel W index that +1), phase (2q-1+t) % pack_in. The H axis
    keeps the canonical k3/s2/pad1 geometry.
    """
    kh, kw, c, co = w.shape
    assert (kh, kw) == (3, 3) and pack_in == 2 * pack_out, (w.shape, pack_in)
    out = np.zeros((3, 2, pack_in * c, pack_out * co), w.dtype)
    for q in range(pack_out):
        for t in range(3):
            x = 2 * q - 1 + t                 # relative to pack_in * w
            m = x // pack_in                  # -1 (left pad cell) or 0
            p = x % pack_in
            out[:, m + 1, p * c:(p + 1) * c, q * co:(q + 1) * co] = w[:, t]
    return out


def _tile4(v: np.ndarray) -> np.ndarray:
    return np.tile(np.asarray(v), 4)


_SEGM_CANON_IN = {"up1": 32, "up2": 16, "out1": 64, "out_conv2": 33}


def _transform_segm_tree(seg: Dict) -> None:
    """Canonical segm-head params -> 4x-channel macro-conv form (exact).

    Convs get ``s2d_conv3_weights``; per-out-channel vectors (conv bias,
    folded-BN scale/bias) tile 4x phase-major. Idempotent via the
    canonical input-channel count of each layer.
    """
    def _pad_out(v, lanes):
        v = np.asarray(v)
        return np.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, lanes - v.shape[-1])])

    for name in ("up1", "up2", "out1"):
        if name not in seg:
            continue
        k = np.asarray(seg[name]["conv"]["kernel"])
        if k.shape[2] != _SEGM_CANON_IN[name]:      # already transformed
            continue
        kk = s2d_conv3_weights(k)
        bias = _tile4(np.asarray(seg[name]["conv"]["bias"]))
        scale = _tile4(np.asarray(seg[name]["bn"]["scale"]))
        bbias = _tile4(np.asarray(seg[name]["bn"]["bias"]))
        if name == "out1":
            # 132 output lanes straddle the 128-lane MXU tile (13% MXU
            # profiled); evaluate at 256 with zero-padded params — exact
            kk, bias = _pad_out(kk, 256), _pad_out(bias, 256)
            scale, bbias = _pad_out(scale, 256), _pad_out(bbias, 256)
        seg[name]["conv"]["kernel"] = kk
        seg[name]["conv"]["bias"] = bias
        seg[name]["bn"]["scale"] = scale
        seg[name]["bn"]["bias"] = bbias
    if "out_conv2" in seg:
        k = np.asarray(seg["out_conv2"]["kernel"])
        if k.shape[2] == _SEGM_CANON_IN["out_conv2"]:
            kk = s2d_conv3_weights(k)                       # (3,3,132,132)
            kk = np.pad(kk, ((0, 0), (0, 0), (0, 256 - kk.shape[2]),
                             (0, 256 - kk.shape[3])))
            seg["out_conv2"]["kernel"] = kk
            seg["out_conv2"]["bias"] = _pad_out(
                _tile4(np.asarray(seg["out_conv2"]["bias"])), 256)


def _merge_head_transitions(top: Dict, inter_prior: bool = True) -> None:
    """Concatenate the head stacks' transition convs into one dense
    `heads_trans` ConvBN (exact; order matches ACRNet's head_names
    slicing: l then r, kinds params/center/cam[/prior]). The kinds MUST
    match what ACRNet builds — with ``inter_prior=False`` the prior
    heads exist in the checkpoint but the net doesn't instantiate them,
    so merging them would produce a 512-wide kernel against the net's
    384-wide conv. Idempotent; no-op if the tree lacks trans convs."""
    kinds = ("params", "center", "cam") + (("prior",) if inter_prior else ())
    names = []
    for side in ("l", "r"):
        for kind in kinds:
            nm = f"{side}_{kind}_head"
            if nm in top and "trans" in top[nm]:
                names.append(nm)
    if "heads_trans" in top or not names:
        return
    ks, cbs, ss, bs = [], [], [], []
    for nm in names:
        tr = top[nm].pop("trans")
        ks.append(np.asarray(tr["conv"]["kernel"]))
        cbs.append(np.asarray(tr["conv"]["bias"]))
        ss.append(np.asarray(tr["bn"]["scale"]))
        bs.append(np.asarray(tr["bn"]["bias"]))
    top["heads_trans"] = {
        "conv": {"kernel": np.concatenate(ks, axis=3),
                 "bias": np.concatenate(cbs)},
        "bn": {"scale": np.concatenate(ss),
               "bias": np.concatenate(bs)},
    }
    # NOTE: also merging the per-head 1x1 OUT convs block-diagonally
    # was measured and reverted — the blk-output concat it requires
    # puts half the heads at 64-lane (half-tile) offsets, and those
    # read-modify-write stores cost more than the merged conv saved.


def transform_params_s2d(params: Dict, highres: bool = True,
                         segm: bool = False, stem: bool = False,
                         merged_heads: bool = False,
                         inter_prior: bool = True) -> Dict:
    """Rewrite a canonical param tree for the s2d network (idempotent).

    ``highres`` touches `backbone/stage*_*`: the b0_* BasicBlock
    convs/BNs, the coarse->fine `fuse_0_{j}` 1x1 convs (output tiled
    x4), the first conv of every fuse-down chain out of branch 0
    (`fuse_{i}_0_0`), and `transition1_0` (pack folded in). ``segm``
    touches the `segm` head (macro-conv form for the 256x256 convs,
    out convs lane-padded to 256). ``stem`` rewrites `stem1` for the
    2x2-packed uint8 input. ``merged_heads`` concatenates the 8 head
    stacks' transition convs into one `heads_trans`. Everything else —
    and the checkpoint npz format — stays canonical.
    """
    import copy
    params = copy.deepcopy(params)
    top = params.get("params", params)
    if segm and "segm" in top:
        _transform_segm_tree(top["segm"])
    if merged_heads:
        _merge_head_transitions(top, inter_prior=inter_prior)
    bb = top.get("backbone", top)
    if stem and "stem1" in bb:
        k = np.asarray(bb["stem1"]["conv"]["kernel"])
        if k.shape[1] == 3:                       # canonical (not yet W-packed)
            # stem1 reads 4-W-packed rows, emits 2-W-packed output
            # (x2 q-major BN vectors); stem2 folds the unpack into its
            # stride — downstream shapes unchanged
            bb["stem1"]["conv"]["kernel"] = wpack_strided_conv3_weights(k, 4, 2)
            bn = bb["stem1"]["bn"]
            bn["scale"] = np.tile(np.asarray(bn["scale"]), 2)
            bn["bias"] = np.tile(np.asarray(bn["bias"]), 2)
        k2 = np.asarray(bb["stem2"]["conv"]["kernel"])
        if k2.shape[1] == 3:                      # canonical (not yet W-packed)
            bb["stem2"]["conv"]["kernel"] = wpack_strided_conv3_weights(k2, 2, 1)
    if not highres:
        import jax
        import jax.numpy as jnp
        return jax.tree.map(jnp.asarray, params)
    tree = bb

    def _transform_module(mod: Dict) -> None:
        for sub_name, sub in mod.items():
            if sub_name.startswith("b0_"):
                for conv_name in ("conv1", "conv2"):
                    k = np.asarray(sub[conv_name]["kernel"])
                    if k.shape[2] <= 64:          # canonical (not yet 4C)
                        sub[conv_name]["kernel"] = s2d_conv3_weights(k)
                for bn_name in ("bn1", "bn2"):
                    s = np.asarray(sub[bn_name]["scale"])
                    if s.shape[0] <= 64:
                        sub[bn_name]["scale"] = _tile4(s)
                        sub[bn_name]["bias"] = _tile4(
                            np.asarray(sub[bn_name]["bias"]))
            elif sub_name.startswith("fuse_") and sub_name.endswith("_0_0"):
                k = np.asarray(sub["conv"]["kernel"])
                if k.shape[0] == 3:               # canonical (not yet 2x2)
                    sub["conv"]["kernel"] = s2d_strided_conv3_weights(k)
            elif _FUSE_INTO_B0.match(sub_name):
                # coarse->fine 1x1 conv into the packed branch: fold the
                # x4 phase tile into the conv's output axis — exact
                k = np.asarray(sub["conv"]["kernel"])
                if k.shape[3] <= 64:              # canonical (not yet 4Co)
                    sub["conv"]["kernel"] = np.tile(k, (1, 1, 1, 4))
                    sub["bn"]["scale"] = _tile4(np.asarray(sub["bn"]["scale"]))
                    sub["bn"]["bias"] = _tile4(np.asarray(sub["bn"]["bias"]))

    stage_keys = [k for k in tree
                  if k.startswith(("stage2_", "stage3_", "stage4_"))]
    if stage_keys:
        for k in stage_keys:
            _transform_module(tree[k])
        # the branch entry conv emits packed output directly (4x4/s2
        # macro conv — s2d_pack_out_conv3_weights)
        t1 = tree.get("transition1_0")
        if t1 is not None:
            k = np.asarray(t1["conv"]["kernel"])
            if k.shape[0] == 3:                   # canonical (not yet 4x4)
                t1["conv"]["kernel"] = s2d_pack_out_conv3_weights(k)
                t1["bn"]["scale"] = _tile4(np.asarray(t1["bn"]["scale"]))
                t1["bn"]["bias"] = _tile4(np.asarray(t1["bn"]["bias"]))
    elif any(k.startswith("b0_") for k in tree):
        _transform_module(tree)                   # a bare HRModule tree

    # leaves must be device arrays: numpy leaves in a param tree are
    # re-uploaded host->device on EVERY jitted call (measured 750 ms/step
    # through this terminal's relay — 27x the whole program)
    import jax
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, params)
