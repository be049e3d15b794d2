"""Params IO: npz round trip, orbax round trip, format dispatch."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from acr_tpu.io.params import (
    flatten_params,
    load_params,
    load_params_npz,
    load_params_orbax,
    save_params_npz,
    save_params_orbax,
    unflatten_params,
)


@pytest.fixture
def tree(rng):
    return {"params": {
        "a": {"kernel": jnp.asarray(rng.randn(3, 4).astype(np.float32))},
        "b": {"bn": {"scale": jnp.asarray(rng.rand(4).astype(np.float32))}},
    }}


def assert_trees_equal(got, want):
    flat_g, flat_w = flatten_params(got), flatten_params(want)
    assert set(flat_g) == set(flat_w)
    for k in flat_w:
        np.testing.assert_allclose(flat_g[k], flat_w[k], atol=0)


def test_npz_round_trip(tree, tmp_path):
    p = str(tmp_path / "ckpt.npz")
    save_params_npz(p, tree)
    assert_trees_equal(load_params_npz(p), tree)
    assert_trees_equal(load_params(p), tree)        # dispatch by extension


def test_flatten_unflatten(tree):
    assert_trees_equal(unflatten_params(flatten_params(tree)), tree)


def test_orbax_round_trip(tree, tmp_path):
    p = str(tmp_path / "ckpt_orbax")
    try:
        save_params_orbax(p, tree)
    except ImportError:
        pytest.skip("orbax not installed")
    got = load_params_orbax(p)
    assert_trees_equal(got, tree)
    assert_trees_equal(load_params(p), tree)        # dispatch by directory
