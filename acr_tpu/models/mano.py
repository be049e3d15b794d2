"""MANO statistical hand model as a pure-JAX function.

Functionally equivalent to the reference torch ManoLayer in its demo
configuration — ``use_pca=False, joint_rot_mode='axisang',
flat_hand_mean=False, center_idx=9`` (reference: acr/mano_wrapper.py:18-33,
mano/manolayer.py:104-276) — but re-shaped for TPU:

* all per-stage math is a handful of large batched einsums that map
  onto the MXU (shape blend, pose blend, LBS);
* forward kinematics keeps the reference's 3-level x 5-finger batched
  structure (mano/manolayer.py:190-223) — three (B,5,4,4) matmul chains,
  no per-joint Python loop;
* no module state: parameters are a NamedTuple pytree loaded once from
  npz (see tools/convert_mano.py), so the whole thing inlines into the
  surrounding jitted program and XLA fuses it end to end.

A fused single-kernel Pallas implementation of the blendshape+LBS path
lives in acr_tpu/ops/mano_kernel.py; this file is the reference/fallback.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acr_tpu.ops.rotations import axis_angle_to_rotmat

# fingertip vertex ids (reference: mano/manolayer.py:244-247)
TIPS_RIGHT = (745, 317, 444, 556, 673)
TIPS_LEFT = (745, 317, 445, 556, 673)

# FK levels (reference: mano/manolayer.py:191-193)
LEV1 = (1, 4, 7, 10, 13)
LEV2 = (2, 5, 8, 11, 14)
LEV3 = (3, 6, 9, 12, 15)
# transform reorder back to joint order (reference: mano/manolayer.py:222)
REORDER_16 = (0, 1, 6, 11, 2, 7, 12, 3, 8, 13, 4, 9, 14, 5, 10, 15)
# output joint order: wrist, thumb..pinky chains with tips interleaved
# (reference: mano/manolayer.py:254)
REORDER_21 = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
              10, 11, 12, 19, 7, 8, 9, 20)

_HP = jax.lax.Precision.HIGHEST


class ManoModel(NamedTuple):
    """MANO parameters as a pytree of device arrays (one hand side)."""
    v_template: jnp.ndarray    # (778, 3)
    shapedirs: jnp.ndarray     # (778, 3, 10)
    posedirs: jnp.ndarray      # (778, 3, 135)
    j_regressor: jnp.ndarray   # (16, 778)
    weights: jnp.ndarray       # (778, 16)
    hands_mean: jnp.ndarray    # (45,)
    tips: jnp.ndarray          # (5,) int32 fingertip vertex ids


def load_mano_model(mano_dir: str, side: str,
                    dtype=jnp.float32) -> Tuple[ManoModel, np.ndarray]:
    """Load one hand side from npz. Returns (model, faces[1538,3])."""
    path = os.path.join(mano_dir, f"mano_{side}.npz")
    d = np.load(path)
    tips = TIPS_LEFT if side == "left" else TIPS_RIGHT
    model = ManoModel(
        v_template=jnp.asarray(d["v_template"], dtype),
        shapedirs=jnp.asarray(d["shapedirs"], dtype),
        posedirs=jnp.asarray(d["posedirs"], dtype),
        j_regressor=jnp.asarray(d["J_regressor"], dtype),
        weights=jnp.asarray(d["weights"], dtype),
        hands_mean=jnp.asarray(d["hands_mean"], dtype),
        tips=jnp.asarray(tips, jnp.int32),
    )
    return model, np.asarray(d["faces"], np.int32)


def _with_translation(rots: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Build [..., 4, 4] rigid transforms from [..., 3, 3] and [..., 3]."""
    top = jnp.concatenate([rots, trans[..., None]], axis=-1)        # [...,3,4]
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)  # [...,1,4]
    return jnp.concatenate([top, bottom], axis=-2)


def mano_forward(model: ManoModel,
                 poses: jnp.ndarray,
                 betas: jnp.ndarray,
                 center_idx: Optional[int] = 9,
                 add_mean: bool = True):
    """MANO forward pass.

    Args:
      poses: (B, 48) axis-angle — [global_orient(3) | 15 joint rotations(45)].
        The stored mean hand pose is added to the 45 articulation dims when
        ``add_mean`` (flat_hand_mean=False semantics, mano/manolayer.py:134-137).
      betas: (B, 10) shape coefficients.
      center_idx: output root-alignment joint (None disables).

    Returns:
      verts: (B, 778, 3), joints: (B, 21, 3), center: (B, 1, 3) or None.
    """
    B = poses.shape[0]
    root_aa = poses[:, :3]
    hand_aa = poses[:, 3:]
    if add_mean:
        hand_aa = hand_aa + model.hands_mean[None]

    full_aa = jnp.concatenate([root_aa, hand_aa], axis=1).reshape(B, 16, 3)
    rotmats = axis_angle_to_rotmat(full_aa)                 # (B, 16, 3, 3)
    root_rot = rotmats[:, 0]
    # pose blendshape coefficients: R - I for the 15 articulated joints
    pose_map = (rotmats[:, 1:] - jnp.eye(3, dtype=rotmats.dtype)).reshape(B, 135)

    # shape blend + joint regression (MXU einsums)
    v_shaped = jnp.einsum("vct,bt->bvc", model.shapedirs, betas,
                          precision=_HP) + model.v_template[None]
    j_rest = jnp.einsum("jv,bvc->bjc", model.j_regressor, v_shaped,
                        precision=_HP)                       # (B, 16, 3)
    v_posed = v_shaped + jnp.einsum("vcp,bp->bvc", model.posedirs, pose_map,
                                    precision=_HP)

    # ---- forward kinematics: 3 levels x 5 fingers, batched 4x4 chains ----
    lev1, lev2, lev3 = list(LEV1), list(LEV2), list(LEV3)
    root_j = j_rest[:, 0]                                    # (B, 3)
    g_root = _with_translation(root_rot, root_j)             # (B, 4, 4)

    rel1 = _with_translation(rotmats[:, [i for i in lev1]],
                             j_rest[:, lev1] - root_j[:, None])
    rel2 = _with_translation(rotmats[:, [i for i in lev2]],
                             j_rest[:, lev2] - j_rest[:, lev1])
    rel3 = _with_translation(rotmats[:, [i for i in lev3]],
                             j_rest[:, lev3] - j_rest[:, lev2])

    g1 = jnp.einsum("bij,bfjk->bfik", g_root, rel1, precision=_HP)
    g2 = jnp.einsum("bfij,bfjk->bfik", g1, rel2, precision=_HP)
    g3 = jnp.einsum("bfij,bfjk->bfik", g2, rel3, precision=_HP)

    g_all = jnp.concatenate([g_root[:, None], g1, g2, g3], axis=1)
    g_all = g_all[:, list(REORDER_16)]                       # (B, 16, 4, 4)

    # remove rest-pose joint location: G' = G - pack(G @ [j; 0])
    j_h = jnp.concatenate([j_rest, jnp.zeros((B, 16, 1), j_rest.dtype)], -1)
    shifted = jnp.einsum("bjik,bjk->bji", g_all, j_h, precision=_HP)
    g_skin = g_all.at[:, :, :, 3].add(-shifted)

    # ---- linear blend skinning ----
    # T(b,v,4,4) = sum_j weights[v,j] * G'(b,j,4,4); then apply to v_posed
    t = jnp.einsum("vj,bjik->bvik", model.weights, g_skin, precision=_HP)
    verts = (jnp.einsum("bvik,bvk->bvi", t[:, :, :3, :3], v_posed,
                        precision=_HP) + t[:, :, :3, 3])

    joints16 = g_all[:, :, :3, 3]
    tips = verts[:, model.tips]                              # (B, 5, 3)
    joints21 = jnp.concatenate([joints16, tips], axis=1)[:, list(REORDER_21)]

    center = None
    if center_idx is not None:
        center = joints21[:, center_idx:center_idx + 1]      # (B, 1, 3)
        joints21 = joints21 - center
        verts = verts - center
    return verts, joints21, center
