"""Independent numpy MANO implementation used as the golden reference.

Deliberately written with a *different* algorithm than the production
path (acr_tpu/models/mano.py): classic Rodrigues formula instead of the
quaternion route, and a sequential per-joint kinematic loop over the
kintree instead of the 3-level batched scheme. Agreement between the
two implementations validates both.
"""

import numpy as np

KINTREE_PARENTS = [-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14]
REORDER_21 = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
              10, 11, 12, 19, 7, 8, 9, 20]
TIPS = {"right": [745, 317, 444, 556, 673], "left": [745, 317, 445, 556, 673]}


def rodrigues(aa):
    """Axis-angle (3,) -> rotation matrix (3,3), classic formula.

    Keeps the reference's component-shift guard (angle = ||aa + 1e-8||)
    so near-zero behaviour matches bit-for-bit-ish.
    """
    angle = np.linalg.norm(aa + 1e-8)
    axis = aa / angle
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def golden_mano_forward(assets, poses, betas, center_idx=9, add_mean=True):
    """poses (B,48) axis-angle, betas (B,10) -> verts (B,778,3), joints (B,21,3)."""
    v_template = assets["v_template"].astype(np.float64)
    shapedirs = assets["shapedirs"].astype(np.float64)
    posedirs = assets["posedirs"].astype(np.float64)
    j_reg = assets["J_regressor"].astype(np.float64)
    weights = assets["weights"].astype(np.float64)
    hands_mean = assets["hands_mean"].astype(np.float64)
    side = str(assets["side"])
    tips = TIPS[side]

    B = poses.shape[0]
    all_verts, all_joints = [], []
    for b in range(B):
        pose = poses[b].astype(np.float64).copy()
        if add_mean:
            pose[3:] = pose[3:] + hands_mean
        rots = np.stack([rodrigues(pose[3 * i:3 * i + 3]) for i in range(16)])
        pose_map = (rots[1:] - np.eye(3)).reshape(135)

        v_shaped = v_template + shapedirs @ betas[b].astype(np.float64)
        j_rest = j_reg @ v_shaped
        v_posed = v_shaped + posedirs @ pose_map

        # sequential FK over the kintree
        g = np.zeros((16, 4, 4))
        for j in range(16):
            p = KINTREE_PARENTS[j]
            local = np.eye(4)
            local[:3, :3] = rots[j]
            local[:3, 3] = j_rest[j] - (j_rest[p] if p >= 0 else 0.0)
            g[j] = local if p < 0 else g[p] @ local

        joints16 = g[:, :3, 3].copy()

        # skinning transforms relative to rest pose
        g_skin = g.copy()
        for j in range(16):
            g_skin[j, :3, 3] -= g[j, :3, :3] @ j_rest[j]

        t = np.einsum("vj,jik->vik", weights, g_skin)
        verts = np.einsum("vik,vk->vi", t[:, :3, :3], v_posed) + t[:, :3, 3]

        joints21 = np.concatenate([joints16, verts[tips]], axis=0)[REORDER_21]
        if center_idx is not None:
            c = joints21[center_idx:center_idx + 1]
            joints21 = joints21 - c
            verts = verts - c
        all_verts.append(verts)
        all_joints.append(joints21)
    return np.stack(all_verts), np.stack(all_joints)
