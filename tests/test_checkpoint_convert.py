"""Checkpoint converter round trip: synthetic torch state dict -> flax forward.

Builds a torch-style state dict with the reference's key names/layouts
(derived from the name map whose key names are themselves pinned by
hand-written spot checks in test_torch_names.py), converts it, loads it
into the flax model, and runs a forward — validating shapes, BN
folding, and coverage end to end without the license-gated checkpoint.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.io.params import unflatten_params
from acr_tpu.io.torch_names import map_flax_path
from tools.convert_checkpoint import convert_state_dict, enumerate_flax_paths


@pytest.fixture(scope="module")
def flax_shapes():
    from acr_tpu.models.acr import ACRNet
    net = ACRNet()
    shapes = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.uint8)))
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + (k,), v)
        else:
            flat[prefix] = node.shape
    rec((), shapes["params"])
    return flat


@pytest.fixture(scope="module")
def synthetic_torch_sd(flax_shapes, rng):
    """Torch state dict with correct names and torch-layout shapes."""
    sd = {}
    for path, shape in flax_shapes.items():
        base, kind = map_flax_path(path)
        if kind == "conv_kernel":
            kh, kw, ci, co = shape
            sd[base + ".weight"] = rng.randn(co, ci, kh, kw).astype(np.float32)
        elif kind == "conv_bias":
            sd[base + ".bias"] = rng.randn(*shape).astype(np.float32)
        elif kind == "dense_kernel":
            ci, co = shape
            sd[base + ".weight"] = rng.randn(co, ci).astype(np.float32)
        elif kind == "dense_bias":
            sd[base + ".bias"] = rng.randn(*shape).astype(np.float32)
        elif kind == "lc_weight":
            o, c, j = shape
            sd[base + ".weight"] = rng.randn(1, o, c, j, 1, 1).astype(np.float32)
        elif kind == "bn":
            n = shape[0]
            sd.setdefault(base + ".weight", rng.rand(n).astype(np.float32) + 0.5)
            sd.setdefault(base + ".bias", rng.randn(n).astype(np.float32))
            sd.setdefault(base + ".running_mean", rng.randn(n).astype(np.float32))
            sd.setdefault(base + ".running_var", rng.rand(n).astype(np.float32) + 0.2)
    # extra reference-only keys the converter should tolerate/ignore
    sd["segmentation_layers.1.0.weight"] = rng.randn(256, 34, 3, 3).astype(np.float32)
    sd["_result_parser.fusion_fc_end.weight"] = rng.randn(212, 424).astype(np.float32)
    return sd


def test_convert_covers_all_params(flax_shapes, synthetic_torch_sd):
    paths = list(flax_shapes)
    flat, used, missing = convert_state_dict(synthetic_torch_sd, paths)
    assert not missing
    assert len(flat) == len(paths)
    for path, shape in flax_shapes.items():
        assert flat["/".join(path)].shape == tuple(shape)


def test_fp16_checkpoint_normalized(flax_shapes, synthetic_torch_sd):
    """fp16-stored checkpoints convert to fp32 params (BN fold included)."""
    sd16 = {k: (v.astype(np.float16)
                if np.issubdtype(v.dtype, np.floating) else v)
            for k, v in synthetic_torch_sd.items()}
    flat, _, missing = convert_state_dict(sd16, list(flax_shapes))
    assert not missing
    assert all(v.dtype == np.float32 for v in flat.values())
    # folded values agree with the fp32 conversion within fp16 precision
    flat32, _, _ = convert_state_dict(synthetic_torch_sd, list(flax_shapes))
    key = "backbone/stem1/bn/scale"
    np.testing.assert_allclose(flat[key], flat32[key], rtol=2e-3)


def test_bn_folding_values(flax_shapes, synthetic_torch_sd):
    flat, _, _ = convert_state_dict(synthetic_torch_sd, list(flax_shapes))
    base = "backbone.bn1"
    gamma = synthetic_torch_sd[base + ".weight"]
    beta = synthetic_torch_sd[base + ".bias"]
    mean = synthetic_torch_sd[base + ".running_mean"]
    var = synthetic_torch_sd[base + ".running_var"]
    scale = gamma / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(flat["backbone/stem1/bn/scale"], scale, atol=1e-6)
    np.testing.assert_allclose(flat["backbone/stem1/bn/bias"],
                               beta - mean * scale, atol=1e-6)


def test_converted_params_run_forward(flax_shapes, synthetic_torch_sd):
    from acr_tpu.models.acr import ACRNet
    flat, _, _ = convert_state_dict(synthetic_torch_sd, list(flax_shapes))
    params = unflatten_params(flat)
    out = ACRNet().apply(params, jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert out["l_params_maps"].shape == (1, 8, 8, 109)


def test_enumerate_matches_eval_shape(flax_shapes):
    paths = enumerate_flax_paths()
    assert set(map(tuple, paths)) == set(flax_shapes)


# ---------------------------------------------------------------------------
# real-checkpoint container variants (reference load semantics:
# acr/utils.py:1106-1168, acr/main.py:59). The licensed `wild.pkl` is a
# torch-pickled state dict; training-era re-saves wrap it in various
# containers. Every variant must convert without manual surgery.
# ---------------------------------------------------------------------------

def _tiny_torch_sd():
    import torch
    return {
        "backbone.conv1.weight": torch.randn(8, 3, 3, 3),
        "backbone.bn1.weight": torch.rand(8) + 0.5,
    }


def _roundtrip(tmp_path, obj, name):
    import torch
    from tools.convert_checkpoint import _to_numpy_state_dict
    p = str(tmp_path / name)
    torch.save(obj, p)
    return _to_numpy_state_dict(p)


def test_container_bare_state_dict(tmp_path):
    sd = _roundtrip(tmp_path, _tiny_torch_sd(), "bare.pkl")
    assert sd["backbone.conv1.weight"].shape == (8, 3, 3, 3)


def test_container_module_prefixed(tmp_path):
    import collections
    obj = collections.OrderedDict(
        ("module." + k, v) for k, v in _tiny_torch_sd().items())
    sd = _roundtrip(tmp_path, obj, "dp.pkl")
    assert "backbone.conv1.weight" in sd


def test_container_double_module_prefix(tmp_path):
    obj = {"module.module." + k: v for k, v in _tiny_torch_sd().items()}
    sd = _roundtrip(tmp_path, obj, "ddp.pkl")
    assert "backbone.conv1.weight" in sd


@pytest.mark.parametrize("wrapper", ["model_state_dict", "state_dict", "model"])
def test_container_training_checkpoint(tmp_path, wrapper):
    import torch
    obj = {wrapper: {"module." + k: v for k, v in _tiny_torch_sd().items()},
           "optimizer": {"state": {}, "param_groups": [{"lr": 1e-4}]},
           "epoch": 17, "best_score": 0.5}
    sd = _roundtrip(tmp_path, obj, f"{wrapper}.pkl")
    assert set(sd) == {"backbone.conv1.weight", "backbone.bn1.weight"}


def test_container_fp16_tensors(tmp_path, flax_shapes, synthetic_torch_sd):
    import torch
    obj = {"module." + k: torch.from_numpy(np.asarray(v)).half()
           if np.issubdtype(np.asarray(v).dtype, np.floating)
           else torch.from_numpy(np.asarray(v))
           for k, v in synthetic_torch_sd.items()}
    sd = _roundtrip(tmp_path, obj, "fp16.pkl")
    flat, _, missing = convert_state_dict(sd, list(flax_shapes))
    assert not missing
    assert all(v.dtype == np.float32 for v in flat.values())


def test_container_non_tensor_entries_skipped(tmp_path):
    obj = dict(_tiny_torch_sd())
    obj["epoch"] = 3
    obj["note"] = "trained on interhand"
    obj["nothing"] = None
    sd = _roundtrip(tmp_path, obj, "junk.pkl")
    assert "backbone.conv1.weight" in sd
    assert "note" not in sd and "nothing" not in sd
    assert sd["epoch"].shape == ()            # scalar arrays are harmless


def test_container_whole_module(tmp_path):
    import torch
    mod = torch.nn.Sequential(torch.nn.Conv2d(3, 4, 3))
    sd = _roundtrip(tmp_path, mod, "module.pkl")
    assert "0.weight" in sd and sd["0.weight"].shape == (4, 3, 3, 3)


def test_container_unsupported_raises(tmp_path):
    with pytest.raises(ValueError, match="unsupported checkpoint"):
        _roundtrip(tmp_path, [1, 2, 3], "list.pkl")
