"""Device mesh + sharding helpers (data parallelism over ICI).

The reference's only parallelism is single-process ``nn.DataParallel``
replicate/scatter/gather over CUDA devices (reference: acr/main.py:61;
vendored variant acr/utils.py:973-1085). The TPU-native equivalent is
GSPMD: build a 1-D ``jax.sharding.Mesh`` over the 'data' axis, mark the
frame batch as batch-sharded and the parameters as replicated, and let
XLA insert the (trivially few) collectives over ICI. Multi-host DCN
data parallelism is then a mesh-construction change, not a code change.

Per SURVEY.md §2.6 the model (30M params, per-frame vision) warrants
neither tensor nor pipeline parallelism; the mesh is deliberately 1-D.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     initialization_timeout: Optional[float] = None) -> bool:
    """Join a multi-process (multi-host) JAX runtime, if configured.

    The reference declares DDP flags that nothing ever consumes
    (--local_rank/--distributed_training, acr/config.py:136-138); here
    multi-host data parallelism is real: after this call
    ``jax.devices()`` spans every process, so the same 1-D 'data' mesh
    shards frame batches across hosts with XLA collectives riding
    DCN/ICI — no other code changes.

    Arguments fall back to the environment (``ACR_COORDINATOR``,
    ``ACR_NUM_PROCESSES``, ``ACR_PROCESS_ID``; ``ACR_INIT_TIMEOUT``
    seconds for the coordinator barrier — raise it when ranks start
    slowly, e.g. compile-loaded shared hosts). Returns True if a
    distributed runtime was initialized, False if unconfigured
    (single-process mode). Idempotent: repeated calls are no-ops.
    """
    coordinator = coordinator or os.environ.get("ACR_COORDINATOR")
    if not coordinator:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get("ACR_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("ACR_PROCESS_ID", "0"))
    if jax.distributed.is_initialized():
        return True                      # already initialized
    if initialization_timeout is None:
        initialization_timeout = float(
            os.environ.get("ACR_INIT_TIMEOUT", "300"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=int(initialization_timeout))
    return True


def make_mesh(n_data: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_data`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_data is not None:
        if n_data > len(devs):
            raise ValueError(
                f"requested {n_data} devices, have {len(devs)}")
        devs = devs[:n_data]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pipeline_inputs(mesh: Mesh, params: Any, image, offsets):
    """Place params replicated and frame batch sharded on the mesh."""
    rep = replicated_sharding(mesh)
    sb = batch_sharding(mesh)
    params = jax.device_put(params, rep)
    image = jax.device_put(image, sb)
    offsets = jax.device_put(offsets, sb)
    return params, image, offsets
