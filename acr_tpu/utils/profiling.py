"""jax.profiler integration (the reference's --track_memory_usage flag
is dead code, acr/config.py:181; here --profile_dir captures a real
XLA/TPU trace viewable in TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib
from typing import Optional


@contextlib.contextmanager
def profile_trace(profile_dir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed block when enabled."""
    if not profile_dir:
        yield
        return
    import jax
    with jax.profiler.trace(profile_dir):
        yield
