"""CLI entry point: ``python -m acr_tpu.cli --demo_mode image --inputs ...``.

Mirrors the reference CLI surface (reference: acr/main.py:144-205,
acr/config.py) with the same mode names and short flags (-t, -s, -v).
"""

from __future__ import annotations

import logging
import sys


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
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
