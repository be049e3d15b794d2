"""Fused MANO blendshape + skinning as a single Pallas TPU kernel.

The vertex-heavy tail of the MANO forward —

    v_posed = v_template + shapedirs @ betas + posedirs @ pose_map
    T       = weights @ G_skin
    verts   = T[:, :3, :3] @ v_posed + T[:, :3, 3]

— fused into one kernel so the intermediate 778-vertex tensors never
leave VMEM (reference computes these as five separate torch ops,
mano/manolayer.py:173-240). The tiny per-joint math (Rodrigues, the
3-level FK chains) stays in JAX where XLA already handles it well; the
kernel takes the blend coefficients and the 16 skinning transforms.

Layout strategy (TPU tiling: last dim = lanes, multiples of 128):

* vertices live on the LANE axis, padded 778 -> 896 (= 7 x 128);
* the blend basis is one (146, 3*896) matrix ``[1 | betas | pose_map]``
  -> x/y/z coordinate planes, so the whole blendshape evaluation is a
  single MXU matmul ``coef @ basis``;
* skinning transforms arrive as (B*12, 16) rows; ``rows @ weights_T``
  is a second MXU matmul; the final affine apply is 9 VPU
  multiply-adds on (B, 896) planes — no lane-dim reshapes anywhere.

Everything fits VMEM for any realistic batch (basis 1.7 MB, per-batch
buffers ~50 KB/hand).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acr_tpu.models.mano import (
    LEV1, LEV2, LEV3, REORDER_16, REORDER_21, ManoModel, _with_translation,
)
from acr_tpu.ops.rotations import axis_angle_to_rotmat

V_REAL = 778
V_PAD = 896            # 7 * 128 lanes
N_COEF = 146           # 1 + 10 betas + 135 pose-map entries
_HP = jax.lax.Precision.HIGHEST


class ManoKernelData(NamedTuple):
    """Precomputed constant operands for the fused kernel (one side)."""
    basis: jnp.ndarray         # (146, 3*896) [template|shapedirs|posedirs] planes
    weights_t: jnp.ndarray     # (16, 896) skinning weights, transposed+padded
    j_basis: jnp.ndarray       # (11, 16, 3): rest joints = [1|betas] @ j_basis
    hands_mean: jnp.ndarray    # (45,)
    tips: jnp.ndarray          # (5,) int32


def build_kernel_data(model: ManoModel) -> ManoKernelData:
    """Pack a ManoModel into kernel-friendly constants."""
    v_t = np.zeros((3, V_PAD), np.float32)
    v_t[:, :V_REAL] = np.asarray(model.v_template).T
    sh = np.zeros((10, 3, V_PAD), np.float32)
    sh[:, :, :V_REAL] = np.transpose(np.asarray(model.shapedirs), (2, 1, 0))
    po = np.zeros((135, 3, V_PAD), np.float32)
    po[:, :, :V_REAL] = np.transpose(np.asarray(model.posedirs), (2, 1, 0))
    basis = np.concatenate([v_t.reshape(1, 3 * V_PAD),
                            sh.reshape(10, 3 * V_PAD),
                            po.reshape(135, 3 * V_PAD)], axis=0)

    w_t = np.zeros((16, V_PAD), np.float32)
    w_t[:, :V_REAL] = np.asarray(model.weights).T

    # rest joints as a function of betas: j = J_reg @ (v_t + shapedirs@betas)
    jr = np.asarray(model.j_regressor)
    j0 = jr @ np.asarray(model.v_template)                     # (16, 3)
    jsh = np.einsum("jv,vct->tjc", jr, np.asarray(model.shapedirs))  # (10,16,3)
    j_basis = np.concatenate([j0[None], jsh], axis=0)          # (11, 16, 3)

    return ManoKernelData(
        basis=jnp.asarray(basis),
        weights_t=jnp.asarray(w_t),
        j_basis=jnp.asarray(j_basis),
        hands_mean=model.hands_mean,
        tips=model.tips,
    )


def _fused_kernel(coef_ref, g_ref, basis_ref, wt_ref, out_ref):
    """Pallas body: blendshapes + LBS for a whole batch in VMEM.

    coef (B, 146); g (B*12, 16); basis (146, 3*896); wt (16, 896)
    -> out (B, 3*896) with x/y/z planes on the lane axis.
    """
    coef = coef_ref[:]
    vp = jnp.dot(coef, basis_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    t = jnp.dot(g_ref[:], wt_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    b = coef.shape[0]
    t3 = t.reshape(b, 12, V_PAD)                   # sublane split: free
    x = vp[:, :V_PAD]
    y = vp[:, V_PAD:2 * V_PAD]
    z = vp[:, 2 * V_PAD:]

    vx = t3[:, 0] * x + t3[:, 1] * y + t3[:, 2] * z + t3[:, 3]
    vy = t3[:, 4] * x + t3[:, 5] * y + t3[:, 6] * z + t3[:, 7]
    vz = t3[:, 8] * x + t3[:, 9] * y + t3[:, 10] * z + t3[:, 11]
    out_ref[:] = jnp.concatenate([vx, vy, vz], axis=1)


B_BLOCK = 64           # batch tile: bounds VMEM (the t buffer is
                       # (12*B_BLOCK, 896) f32 = 2.75 MB; an ungridded
                       # B=1024 call OOMs scoped vmem at 55 MB)


def fused_blend_skin(data: ManoKernelData, coef: jnp.ndarray,
                     g_rows: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """coef (B, 146), g_rows (B*12, 16) -> verts (B, 778, 3).

    The batch is padded to a multiple of 8 (f32 sublane tile — small
    batches otherwise trip Mosaic on the in-kernel (B, 12, lanes)
    reshape/concat) and gridded in B_BLOCK tiles so VMEM use is
    constant in batch size.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = coef.shape[0]
    bp = ((b + 7) // 8) * 8
    blk = min(B_BLOCK, bp)
    bp = ((bp + blk - 1) // blk) * blk
    if bp != b:
        coef = jnp.concatenate(
            [coef, jnp.zeros((bp - b,) + coef.shape[1:], coef.dtype)], axis=0)
        g_rows = jnp.concatenate(
            [g_rows, jnp.zeros(((bp - b) * 12,) + g_rows.shape[1:],
                               g_rows.dtype)], axis=0)
    out = pl.pallas_call(
        _fused_kernel,
        grid=(bp // blk,),
        in_specs=[
            pl.BlockSpec((blk, N_COEF), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk * 12, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_COEF, 3 * V_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, V_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, 3 * V_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 3 * V_PAD), jnp.float32),
        interpret=interpret,
    )(coef, g_rows, data.basis, data.weights_t)
    planes = out.reshape(bp, 3, V_PAD)[:b, :, :V_REAL]
    return planes.transpose(0, 2, 1)               # (B, 778, 3)


def mano_forward_fused(data: ManoKernelData,
                       poses: jnp.ndarray,
                       betas: jnp.ndarray,
                       center_idx: Optional[int] = 9,
                       add_mean: bool = True,
                       interpret: bool = False):
    """Drop-in fused equivalent of models.mano.mano_forward.

    Small per-joint math (rotations, FK) in JAX; vertex-heavy
    blendshape+LBS in the Pallas kernel. Returns (verts, joints21, center).
    """
    b = poses.shape[0]
    root_aa = poses[:, :3]
    hand_aa = poses[:, 3:]
    if add_mean:
        hand_aa = hand_aa + data.hands_mean[None]
    full_aa = jnp.concatenate([root_aa, hand_aa], axis=1).reshape(b, 16, 3)
    rotmats = axis_angle_to_rotmat(full_aa)
    pose_map = (rotmats[:, 1:] - jnp.eye(3, dtype=rotmats.dtype)).reshape(b, 135)

    # rest joints from the tiny joint basis (11 x 16 x 3)
    coef_j = jnp.concatenate([jnp.ones((b, 1), betas.dtype), betas], axis=1)
    j_rest = jnp.einsum("bt,tjc->bjc", coef_j, data.j_basis, precision=_HP)

    # 3-level FK (identical to models.mano)
    root_j = j_rest[:, 0]
    g_root = _with_translation(rotmats[:, 0], root_j)
    rel1 = _with_translation(rotmats[:, list(LEV1)],
                             j_rest[:, list(LEV1)] - root_j[:, None])
    rel2 = _with_translation(rotmats[:, list(LEV2)],
                             j_rest[:, list(LEV2)] - j_rest[:, list(LEV1)])
    rel3 = _with_translation(rotmats[:, list(LEV3)],
                             j_rest[:, list(LEV3)] - j_rest[:, list(LEV2)])
    g1 = jnp.einsum("bij,bfjk->bfik", g_root, rel1, precision=_HP)
    g2 = jnp.einsum("bfij,bfjk->bfik", g1, rel2, precision=_HP)
    g3 = jnp.einsum("bfij,bfjk->bfik", g2, rel3, precision=_HP)
    g_all = jnp.concatenate([g_root[:, None], g1, g2, g3], axis=1)
    g_all = g_all[:, list(REORDER_16)]

    j_h = jnp.concatenate([j_rest, jnp.zeros((b, 16, 1), j_rest.dtype)], -1)
    shifted = jnp.einsum("bjik,bjk->bji", g_all, j_h, precision=_HP)
    g_skin = g_all.at[:, :, :, 3].add(-shifted)

    # kernel operands
    coef = jnp.concatenate([jnp.ones((b, 1), betas.dtype), betas, pose_map],
                           axis=1)                                  # (B, 146)
    g_rows = g_skin[:, :, :3, :].transpose(0, 2, 3, 1).reshape(b * 12, 16)
    verts = fused_blend_skin(data, coef, g_rows, interpret=interpret)

    joints16 = g_all[:, :, :3, 3]
    tips = verts[:, data.tips]
    joints21 = jnp.concatenate([joints16, tips], axis=1)[:, list(REORDER_21)]
    center = None
    if center_idx is not None:
        center = joints21[:, center_idx:center_idx + 1]
        joints21 = joints21 - center
        verts = verts - center
    return verts, joints21, center
