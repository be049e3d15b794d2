"""Multi-process (multi-host-shaped) data parallelism smoke.

The reference's DDP flags were dead (acr/config.py:136-138 — never
consumed). Here the claim is stronger and therefore tested: two fresh
interpreters join one jax.distributed runtime (gloo over localhost,
exactly the wiring a DCN deployment uses with real addresses), build
the SAME 1-D 'data' mesh over the union of their devices, and run the
full jitted inference step with the frame batch sharded across
processes. Subprocess-based because XLA device-count flags must be set
before backend init.
"""

import numpy as np

from __graft_entry__ import dryrun_multiprocess
from acr_tpu.parallel.mesh import init_distributed


def test_init_distributed_unconfigured_is_noop(monkeypatch):
    monkeypatch.delenv("ACR_COORDINATOR", raising=False)
    assert init_distributed() is False          # single-process mode


def test_two_process_full_step():
    dryrun_multiprocess(n_processes=2, devices_per_process=2)
