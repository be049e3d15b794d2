"""Test harness setup.

Tests run on the JAX CPU backend with 8 virtual devices so that
multi-chip sharding paths (jax.sharding.Mesh over the 'data' axis) are
exercised without real TPU hardware (SURVEY.md §4). Environment must be
set before the first `import jax` anywhere in the test process.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# Hard override to the CPU backend: the host sitecustomize registers the
# 'axon' TPU platform and forces jax_platforms='axon,cpu' at interpreter
# start (env vars are ignored), and TPU default conv/matmul precision is
# reduced — tests need exact CPU math. Must run before any backend use.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-dominated (the
# pipeline tests each jit the full network; ~26 min cold on this
# single-core host). Caching compilations across test processes makes
# repeat runs fast. Keyed by backend+flags, so it coexists with the TPU
# cache entries in the same directory (.jax_cache is git-ignored).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("ACR_COMPILE_CACHE",
                                 os.path.join(_REPO, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    # module-scoped: each test module gets a fresh deterministic stream,
    # so adding tests in one module can't shift another module's data
    return np.random.RandomState(0)
