#!/usr/bin/env python
"""Re-measure the b1 stream-step precision ladder (round-5 item 2).

BENCH_r04 inverted the documented "bf16 slower than fp32 at b1"
anomaly after the planar-RGBA rewrites; this tool measures fp32 / bf16
/ int8 (and optionally 2048px) b1 fused stream steps with enough
repetitions to separate them from the relay noise band, and prints one
JSON blob for docs/PERFORMANCE.md. Uses bench.stream_step_setup — the
same scene, scaffolding and methodology as the bench artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--with_2048", action="store_true")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ACR_COMPILE_CACHE",
                                     os.path.join(REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import __graft_entry__ as ge
    ge._ensure_assets()
    from bench import _measure_stream_b1

    variants = [
        ("fp32", dict()),
        ("bf16", dict(precision="bf16", tag="_bf16")),
        ("int8", dict(precision="bf16", quantize="int8", tag="_int8")),
    ]
    if args.with_2048:
        # min_iters=60 mirrors bench.py's stream_step_ms_b1_2048px
        # variant: at 30 chained steps the 16 MB packed outputs keep
        # the dispatch queue in its fill transient (+10 ms/step
        # measured), so shorter chains report queue-fill, not the
        # sustained rate the ladder documents.
        variants.append(("2048px", dict(render_size=2048, tag="_2048px",
                                        min_iters=60)))

    out = {"iters": args.iters, "reps": args.reps,
           "backend": jax.default_backend()}
    for name, kwargs in variants:
        r = _measure_stream_b1(args.iters, args.reps, **kwargs)
        out[name] = r
        print(f"# {name}: {r}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
