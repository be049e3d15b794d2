"""Flat npz <-> nested flax params pytree.

The on-disk checkpoint format for acr_tpu is a plain npz whose keys are
'/'-joined flax parameter paths (e.g. ``backbone/stem1/conv/kernel``).
Produced either by tools/convert_checkpoint.py (from the reference
torch checkpoint, reference: acr/utils.py:1106-1168) or by
tools/make_synthetic_checkpoint.py (random init for tests/benches).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def flatten_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Nested {'params': {...}} tree -> {'a/b/c': array} (params level stripped)."""
    tree = params.get("params", params)
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + (k,), v)
        else:
            flat["/".join(prefix)] = np.asarray(node)

    rec((), tree)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """{'a/b/c': array} -> {'params': nested dict} (jnp arrays)."""
    import jax.numpy as jnp
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return {"params": root}


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    np.savez(path, **flatten_params(params))


def load_params_npz(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})


def save_params_orbax(path: str, params: Dict[str, Any]) -> None:
    """Persist the params pytree as an orbax checkpoint directory.

    Normalized to the same on-disk contract as the npz format (a
    {'params': ...} wrapper regardless of input shape) and overwrites an
    existing checkpoint like save_params_npz does.
    """
    import os
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), unflatten_params(flatten_params(params)),
               force=True)


def load_params_orbax(path: str) -> Dict[str, Any]:
    import os
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return unflatten_params(flatten_params(restored))


def load_params(path: str) -> Dict[str, Any]:
    """Load a checkpoint by format: .npz file or orbax directory."""
    import os
    if os.path.isdir(path):
        return load_params_orbax(path)
    return load_params_npz(path)
