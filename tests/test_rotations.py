"""Unit tests for acr_tpu.ops.rotations against scipy ground truth."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from acr_tpu.ops import (
    axis_angle_to_rotmat,
    rot6d_to_axis_angle,
    rot6d_to_rotmat,
    rotmat_to_axis_angle,
    rotmat_to_quat,
    quat_to_axis_angle,
)


def random_axis_angles(rng, n, max_angle=np.pi * 0.98):
    axes = rng.randn(n, 3)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0.01, max_angle, size=(n, 1))
    return axes * angles


def test_axis_angle_to_rotmat_matches_scipy(rng):
    aa = random_axis_angles(rng, 64)
    got = np.asarray(axis_angle_to_rotmat(jnp.asarray(aa)))
    want = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_axis_angle_to_rotmat_near_zero(rng):
    aa = rng.randn(8, 3) * 1e-9
    got = np.asarray(axis_angle_to_rotmat(jnp.asarray(aa)))
    np.testing.assert_allclose(got, np.tile(np.eye(3), (8, 1, 1)), atol=1e-6)
    assert np.isfinite(got).all()


def test_rotmat_to_axis_angle_roundtrip(rng):
    aa = random_axis_angles(rng, 128)
    mats = R.from_rotvec(aa).as_matrix()
    got = np.asarray(rotmat_to_axis_angle(jnp.asarray(mats)))
    np.testing.assert_allclose(got, aa, atol=1e-4)


def test_rotmat_to_axis_angle_identity():
    got = np.asarray(rotmat_to_axis_angle(jnp.eye(3)[None]))
    np.testing.assert_allclose(got, np.zeros((1, 3)), atol=1e-6)


def test_rotmat_to_axis_angle_near_pi(rng):
    # rotations close to pi hit the other quaternion branches
    aa = random_axis_angles(rng, 32)
    aa = aa / np.linalg.norm(aa, axis=1, keepdims=True) * (np.pi - 1e-3)
    mats = R.from_rotvec(aa).as_matrix()
    got = np.asarray(rotmat_to_axis_angle(jnp.asarray(mats)))
    recon = R.from_rotvec(got).as_matrix()
    np.testing.assert_allclose(recon, mats, atol=1e-4)


def test_rotmat_to_quat_matches_scipy(rng):
    aa = random_axis_angles(rng, 64)
    mats = R.from_rotvec(aa).as_matrix()
    got = np.asarray(rotmat_to_quat(jnp.asarray(mats)))
    want = R.from_rotvec(aa).as_quat()  # (x, y, z, w)
    want = np.concatenate([want[:, 3:4], want[:, :3]], axis=1)
    sign = np.sign(np.sum(got * want, axis=1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_rot6d_to_rotmat_is_valid_rotation(rng):
    x = rng.randn(32, 6)
    got = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    eye = np.einsum("bij,bkj->bik", got, got)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(got), np.ones(32), atol=1e-5)


def test_rot6d_identity_seed():
    # columns (1,0,0) and (0,1,0) -> identity under column Gram-Schmidt.
    # 3x2 column-major read of [...,6]: entries [x0, y0, x1, y1, x2, y2]
    x = jnp.asarray([[1.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
    got = np.asarray(rot6d_to_rotmat(x))
    np.testing.assert_allclose(got[0], np.eye(3), atol=1e-6)


def test_rot6d_to_rotmat_consistency_with_gram_schmidt(rng):
    x = rng.randn(16, 6).astype(np.float32)
    a = x.reshape(16, 3, 2)
    b1 = a[:, :, 0] / np.linalg.norm(a[:, :, 0], axis=1, keepdims=True)
    dot = np.sum(b1 * a[:, :, 1], axis=1, keepdims=True)
    u2 = a[:, :, 1] - dot * b1
    b2 = u2 / np.linalg.norm(u2, axis=1, keepdims=True)
    b3 = np.cross(b1, b2)
    want = np.stack([b1, b2, b3], axis=-1)
    got = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rot6d_to_axis_angle_roundtrip(rng):
    # Construct 6D reps from known rotations, recover axis-angle
    aa = random_axis_angles(rng, 16)
    mats = R.from_rotvec(aa).as_matrix()
    # first two *columns*, flattened row-interleaved: [...,3,2] -> [...,6]
    six = mats[:, :, :2].reshape(16, 6)
    got = np.asarray(rot6d_to_axis_angle(jnp.asarray(six)))
    np.testing.assert_allclose(got, aa, atol=1e-4)


def test_multi_joint_rot6d(rng):
    aa = random_axis_angles(rng, 15 * 4).reshape(4, 45)
    mats = R.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(4, 15, 3, 3)
    six = mats[..., :2].reshape(4, 15 * 6)
    got = np.asarray(rot6d_to_axis_angle(jnp.asarray(six))).reshape(4, 45)
    np.testing.assert_allclose(got, aa, atol=1e-4)


def test_transform_rot_representation_round_trips(rng):
    from acr_tpu.ops.rotations import transform_rot_representation as tr
    vec = np.array([0.1, -0.2, 0.3])
    for mid in ("mat", "quat", "euler"):
        back = tr(tr(vec, "vec", mid), mid, "vec")
        np.testing.assert_allclose(back, vec, atol=1e-8)
    # explicit euler units: degrees round-trip without magnitude guessing
    deg = np.array([2.0, 1.5, 3.0])
    m = tr(deg, "euler", "mat", euler_degrees=True)
    np.testing.assert_allclose(tr(m, "mat", "euler", euler_degrees=True),
                               deg, atol=1e-8)
    want = R.from_euler("xyz", deg, degrees=True).as_matrix()
    np.testing.assert_allclose(m, want, atol=1e-10)
    with pytest.raises(ValueError):
        tr(vec, "nope", "mat")
    with pytest.raises(ValueError):
        tr(vec, "vec", "nope")


def test_quat_to_axis_angle_negative_w(rng):
    aa = random_axis_angles(rng, 8)
    q = R.from_rotvec(aa).as_quat()  # xyzw
    q = np.concatenate([q[:, 3:4], q[:, :3]], 1)
    got_pos = np.asarray(quat_to_axis_angle(jnp.asarray(q)))
    got_neg = np.asarray(quat_to_axis_angle(jnp.asarray(-q)))
    np.testing.assert_allclose(got_pos, got_neg, atol=1e-5)
    np.testing.assert_allclose(got_pos, aa, atol=1e-4)
