"""Fused Pallas MANO kernel vs the pure-JAX reference path.

Runs in Pallas interpret mode on the CPU backend; the same kernel
compiles natively on TPU (exercised by bench/pipeline runs there).
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_mano import make_assets
from tests.test_mano import _model_from_assets

from acr_tpu.models.mano import mano_forward
from acr_tpu.ops.mano_kernel import (
    ManoKernelData,
    build_kernel_data,
    mano_forward_fused,
)


@pytest.fixture(scope="module", params=["right", "left"])
def side(request):
    return request.param


@pytest.fixture(scope="module")
def model(side):
    return _model_from_assets(make_assets(side, seed=0), side)


@pytest.fixture(scope="module")
def kdata(model):
    return build_kernel_data(model)


def test_kernel_data_shapes(kdata):
    assert kdata.basis.shape == (146, 3 * 896)
    assert kdata.weights_t.shape == (16, 896)
    assert kdata.j_basis.shape == (11, 16, 3)
    # padding region is zero
    basis = np.asarray(kdata.basis).reshape(146, 3, 896)
    assert (basis[:, :, 778:] == 0).all()


@pytest.mark.parametrize("batch", [1, 2, 5])
def test_fused_matches_reference(model, kdata, rng, batch):
    poses = jnp.asarray((rng.randn(batch, 48) * 0.5).astype(np.float32))
    betas = jnp.asarray((rng.randn(batch, 10) * 0.7).astype(np.float32))
    v_ref, j_ref, c_ref = mano_forward(model, poses, betas)
    v_fused, j_fused, c_fused = mano_forward_fused(
        kdata, poses, betas, interpret=True)
    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_fused), np.asarray(j_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_fused), np.asarray(c_ref), atol=1e-5)


def test_fused_no_center(model, kdata, rng):
    poses = jnp.asarray((rng.randn(1, 48) * 0.3).astype(np.float32))
    betas = jnp.zeros((1, 10))
    v_ref, j_ref, _ = mano_forward(model, poses, betas, center_idx=None)
    v_f, j_f, c_f = mano_forward_fused(kdata, poses, betas, center_idx=None,
                                       interpret=True)
    assert c_f is None
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_ref), atol=1e-5)


def test_fused_jittable(model, kdata, rng):
    poses = jnp.asarray((rng.randn(2, 48) * 0.3).astype(np.float32))
    betas = jnp.zeros((2, 10))
    fn = jax.jit(lambda p, b: mano_forward_fused(kdata, p, b, interpret=True))
    v, j, c = fn(poses, betas)
    v_ref, j_ref, _ = mano_forward(model, poses, betas)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
