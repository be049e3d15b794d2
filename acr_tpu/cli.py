"""CLI entry point: ``python -m acr_tpu.cli --demo_mode image --inputs ...``.

Mirrors the reference CLI surface (reference: acr/main.py:144-205,
acr/config.py) with the same mode names and short flags (-t, -s, -v).
"""

from __future__ import annotations

import logging
import sys


def _enable_compile_cache():
    """Persistent XLA compile cache (cold 512px compiles take minutes)."""
    import os
    import jax
    cache = os.environ.get(
        "ACR_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    _enable_compile_cache()
    from acr_tpu.config import parse_args
    from acr_tpu.utils.profiling import profile_trace
    from acr_tpu.utils.session import ConfigSession
    cfg = parse_args(argv if argv is not None else sys.argv[1:])
    logging.info("config: %s", cfg)
    from acr_tpu.pipeline.app import ACRApp
    with ConfigSession(cfg):
        app = ACRApp(cfg)
        with profile_trace(cfg.profile_dir):
            return app.run()


if __name__ == "__main__":
    main()
