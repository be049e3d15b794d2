"""Batched 3D rotation conversions in pure JAX.

Numerical contracts follow the reference pipeline so converted
checkpoints produce identical meshes:

* axis-angle -> rotmat goes through a unit quaternion with the same
  ``||aa + 1e-8||`` norm guard (reference: mano/manolayer.py:423-434).
* 6D -> rotmat is the Gram-Schmidt *column* construction used by the
  result parser (reference: acr/utils.py:362-376), NOT the row variant
  from RotationContinuity (mano/manolayer.py:455-475) — the two differ
  and the demo path uses the former for network outputs.
* rotmat -> axis-angle matches the kornia-derived branch logic
  (reference: acr/utils.py:773-906) including its eps=1e-6 branch
  selection, so temporally-smoothed global rotations round-trip the
  same way.

All functions are shape-polymorphic over leading batch dims and safe
under jit/vmap (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def axis_angle_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> unit quaternion [..., 4] (w, x, y, z).

    Matches the reference guard: the angle is the norm of ``aa + 1e-8``
    (a small shift of each component, not an epsilon under the sqrt).
    """
    shifted = aa + 1e-8
    angle = jnp.linalg.norm(shifted, axis=-1, keepdims=True)
    axis = aa / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] (w, x, y, z), any norm -> rotmat [..., 3, 3]."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack([
        ww + xx - yy - zz, 2 * (xy - wz),     2 * (wy + xz),
        2 * (wz + xy),     ww - xx + yy - zz, 2 * (yz - wx),
        2 * (xz - wy),     2 * (wx + yz),     ww - xx - yy + zz,
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    return quat_to_rotmat(axis_angle_to_quat(aa))


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation [..., 6] -> rotmat [..., 3, 3].

    Column-wise Gram-Schmidt: the 6 numbers are read as a 3x2 matrix
    whose columns seed the first two basis vectors; the result stacks
    (b1, b2, b3) as matrix *columns* (reference: acr/utils.py:362-376).
    """
    a = x.reshape(x.shape[:-1] + (3, 2))
    a1, a2 = a[..., 0], a[..., 1]
    eps = 1e-6
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), eps)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    u2 = a2 - proj * b1
    b2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_quat(rotmat: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (w, x, y, z).

    Shepperd-style 4-branch selection with the same branch predicate as
    the reference (kornia lineage, acr/utils.py:826-906): branches keyed
    on ``m[2,2] < eps`` and diagonal comparisons of the *transposed*
    matrix, blended with where-masks (jit-safe).
    """
    batch_shape = rotmat.shape[:-2]
    m = jnp.swapaxes(rotmat.reshape((-1, 3, 3)), -1, -2)  # transposed, as reference

    m00, m01, m02 = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    m10, m11, m12 = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    m20, m21, m22 = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]

    mask_d2 = m22 < eps
    mask_d0_d1 = m00 > m11
    mask_d0_nd1 = m00 < -m11

    t0 = 1 + m00 - m11 - m22
    q0 = jnp.stack([m12 - m21, t0, m01 + m10, m20 + m02], axis=-1)

    t1 = 1 - m00 + m11 - m22
    q1 = jnp.stack([m20 - m02, m01 + m10, t1, m12 + m21], axis=-1)

    t2 = 1 - m00 - m11 + m22
    q2 = jnp.stack([m01 - m10, m20 + m02, m12 + m21, t2], axis=-1)

    t3 = 1 + m00 + m11 + m22
    q3 = jnp.stack([t3, m12 - m21, m20 - m02, m01 - m10], axis=-1)

    c0 = (mask_d2 & mask_d0_d1)[:, None]
    c1 = (mask_d2 & ~mask_d0_d1)[:, None]
    c2 = (~mask_d2 & mask_d0_nd1)[:, None]
    c3 = (~mask_d2 & ~mask_d0_nd1)[:, None]

    q = jnp.where(c0, q0, 0) + jnp.where(c1, q1, 0) \
        + jnp.where(c2, q2, 0) + jnp.where(c3, q3, 0)
    t = jnp.where(c0[:, 0], t0, 0) + jnp.where(c1[:, 0], t1, 0) \
        + jnp.where(c2[:, 0], t2, 0) + jnp.where(c3[:, 0], t3, 0)
    q = q * 0.5 / jnp.sqrt(t)[:, None]
    return q.reshape(batch_shape + (4,))


def quat_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [..., 4] (w, x, y, z) -> axis-angle [..., 3].

    Ceres-style conversion with the shortest-arc sign fix (reference:
    acr/utils.py:773-823): ``2*atan2(±sin, ±cos)`` flipped when w<0, and
    the small-angle limit ``k -> 2``.
    """
    w = quat[..., 0]
    xyz = quat[..., 1:4]
    sin_sq = jnp.sum(xyz * xyz, axis=-1)
    sin_theta = jnp.sqrt(sin_sq)
    two_theta = 2.0 * jnp.where(
        w < 0.0,
        jnp.arctan2(-sin_theta, -w),
        jnp.arctan2(sin_theta, w))
    k_pos = two_theta / jnp.where(sin_theta == 0.0, 1.0, sin_theta)
    k = jnp.where(sin_sq > 0.0, k_pos, 2.0)
    return xyz * k[..., None]


def rotmat_to_axis_angle(rotmat: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3], NaN-safe.

    The reference zeroes NaNs after conversion (acr/utils.py:359); we do
    the same so degenerate inputs degrade identically.
    """
    aa = quat_to_axis_angle(rotmat_to_quat(rotmat))
    return jnp.where(jnp.isnan(aa), 0.0, aa)


def transform_rot_representation(rot, input_type: str = "mat",
                                 out_type: str = "vec",
                                 euler_degrees: bool = False):
    """Host-side conversion between rotation representations via scipy.

    Types: 'mat' (3x3), 'quat' (xyzw), 'vec' (rotation vector),
    'euler' (intrinsic xyz). Covers the capability of the reference's
    converter (acr/utils.py:521-549) with one deliberate change: euler
    units are explicit via ``euler_degrees`` — the reference guesses
    degrees-vs-radians from magnitude (``rot.max() < 4``), silently
    rescaling genuine small-degree inputs.
    """
    import numpy as np
    from scipy.spatial.transform import Rotation as R
    rot = np.asarray(rot)
    loaders = {
        "mat": R.from_matrix,
        "quat": R.from_quat,
        "vec": R.from_rotvec,
        "euler": lambda a: R.from_euler("xyz", a, degrees=euler_degrees),
    }
    if input_type not in loaders:
        raise ValueError(f"unknown input_type: {input_type}")
    r = loaders[input_type](rot)
    writers = {
        "mat": r.as_matrix,
        "quat": r.as_quat,
        "vec": r.as_rotvec,
        "euler": lambda: r.as_euler("xyz", degrees=euler_degrees),
    }
    if out_type not in writers:
        raise ValueError(f"unknown out_type: {out_type}")
    return writers[out_type]()


def rot6d_to_axis_angle(rot6d: jnp.ndarray) -> jnp.ndarray:
    """Flattened 6D rots [..., K*6] -> flattened axis-angle [..., K*3].

    The parser's ``rot6D_to_angular`` (reference: acr/utils.py:378-382).
    """
    lead = rot6d.shape[:-1]
    k = rot6d.shape[-1] // 6
    mats = rot6d_to_rotmat(rot6d.reshape(lead + (k, 6)))
    aa = rotmat_to_axis_angle(mats)
    return aa.reshape(lead + (k * 3,))
