"""MANO layer parity: JAX 3-level batched FK vs independent numpy golden."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_mano import make_assets
from tests.golden_mano import golden_mano_forward

from acr_tpu.models.mano import ManoModel, mano_forward, TIPS_LEFT, TIPS_RIGHT


def _model_from_assets(assets, side):
    tips = TIPS_LEFT if side == "left" else TIPS_RIGHT
    return ManoModel(
        v_template=jnp.asarray(assets["v_template"]),
        shapedirs=jnp.asarray(assets["shapedirs"]),
        posedirs=jnp.asarray(assets["posedirs"]),
        j_regressor=jnp.asarray(assets["J_regressor"]),
        weights=jnp.asarray(assets["weights"]),
        hands_mean=jnp.asarray(assets["hands_mean"]),
        tips=jnp.asarray(tips, jnp.int32),
    )


@pytest.fixture(scope="module", params=["right", "left"])
def side(request):
    return request.param


@pytest.fixture(scope="module")
def assets(side):
    return make_assets(side, seed=0)


@pytest.fixture(scope="module")
def model(assets, side):
    return _model_from_assets(assets, side)


def test_rest_pose_matches_golden(model, assets):
    B = 2
    poses = np.zeros((B, 48), np.float32)
    betas = np.zeros((B, 10), np.float32)
    verts, joints, center = mano_forward(model, jnp.asarray(poses), jnp.asarray(betas))
    gv, gj = golden_mano_forward(assets, poses, betas)
    np.testing.assert_allclose(np.asarray(verts), gv, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), gj, atol=2e-5)
    assert verts.shape == (B, 778, 3)
    assert joints.shape == (B, 21, 3)
    assert center.shape == (B, 1, 3)


def test_posed_hand_matches_golden(model, assets, rng):
    B = 4
    poses = (rng.randn(B, 48) * 0.4).astype(np.float32)
    betas = (rng.randn(B, 10) * 0.8).astype(np.float32)
    verts, joints, _ = mano_forward(model, jnp.asarray(poses), jnp.asarray(betas))
    gv, gj = golden_mano_forward(assets, poses, betas)
    np.testing.assert_allclose(np.asarray(verts), gv, atol=1e-4)
    np.testing.assert_allclose(np.asarray(joints), gj, atol=1e-4)


def test_large_rotations_match_golden(model, assets, rng):
    B = 2
    poses = (rng.randn(B, 48) * 1.5).astype(np.float32)
    betas = np.zeros((B, 10), np.float32)
    verts, joints, _ = mano_forward(model, jnp.asarray(poses), jnp.asarray(betas))
    gv, gj = golden_mano_forward(assets, poses, betas)
    np.testing.assert_allclose(np.asarray(verts), gv, atol=1e-4)
    np.testing.assert_allclose(np.asarray(joints), gj, atol=1e-4)


def test_root_alignment(model):
    poses = jnp.zeros((1, 48))
    betas = jnp.zeros((1, 10))
    _, joints, _ = mano_forward(model, poses, betas, center_idx=9)
    np.testing.assert_allclose(np.asarray(joints[0, 9]), np.zeros(3), atol=1e-6)
    _, joints_nc, center = mano_forward(model, poses, betas, center_idx=None)
    assert center is None


def test_no_mean_flag(model, assets, rng):
    poses = (rng.randn(1, 48) * 0.3).astype(np.float32)
    betas = np.zeros((1, 10), np.float32)
    v1, _, _ = mano_forward(model, jnp.asarray(poses), jnp.asarray(betas), add_mean=False)
    gv, _ = golden_mano_forward(assets, poses, betas, add_mean=False)
    np.testing.assert_allclose(np.asarray(v1), gv, atol=1e-4)


def test_jit_and_global_orient_rotates_rigidly(model):
    fwd = jax.jit(lambda p, b: mano_forward(model, p, b))
    poses = jnp.zeros((1, 48))
    betas = jnp.zeros((1, 10))
    v0, j0, _ = fwd(poses, betas)
    # rotate globally by 90deg about z: root-aligned outputs must be a
    # rigid rotation of each other
    poses_rot = poses.at[0, 2].set(np.pi / 2)
    v1, j1, _ = fwd(poses_rot, betas)
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(np.asarray(v1[0]), np.asarray(v0[0]) @ Rz.T, atol=1e-4)
