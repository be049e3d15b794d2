#!/usr/bin/env python
"""Per-op profile of the FUSED b1 streaming step (forward + OneEuro +
refine + on-device render + packed readback) on the TPU.

Same xprof framework_op_stats analysis as tools/profile_step.py, but on
the program the webcam latency path actually runs — including the
renderer, which dominates at high ``--render_size``. Drives the exact
bench scene via bench.stream_step_setup (the shared public
scaffolding) so the adaptive-capacity tier taken in the trace is the
one the bench measures.

Usage:
    python tools/profile_stream.py [--render_size 2048] [--iters 20]
                                   [--precision fp32] [--top 40]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(precision: str, quantize: str, render_size: int, iters: int,
            trace_dir: str) -> None:
    import jax

    import bench

    # the bench's public scaffolding: same scene, same pre-uploaded
    # donated buffers, same queue-draining readback (ADVICE r4)
    app, step, state, uploads, force = bench.stream_step_setup(
        precision, quantize, render_size)
    pl = app.pipeline

    for img_d, off_d in uploads(3):           # compile + warmup
        state, packed = step(pl.params, pl.mano_l, pl.mano_r, state,
                             img_d, off_d)
    force(packed)

    bufs = uploads(iters)
    with jax.profiler.trace(trace_dir):
        for img_d, off_d in bufs:
            state, packed = step(pl.params, pl.mano_l, pl.mano_r, state,
                                 img_d, off_d)
        force(packed)                         # force inside trace


def main(argv=None):
    from tools.profile_step import find_xspace, op_stats

    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="fp32")
    ap.add_argument("--quantize", default="none")
    ap.add_argument("--render_size", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace_dir", default="/tmp/acr_profile_stream")
    ap.add_argument("--reuse", action="store_true",
                    help="skip capture; analyze an existing trace_dir")
    args = ap.parse_args(argv)

    if not args.reuse:
        capture(args.precision, args.quantize, args.render_size,
                args.iters, args.trace_dir)
    xspace = find_xspace(args.trace_dir)
    print(f"# xspace: {xspace}")
    _, rows = op_stats(xspace)
    if not rows:
        print("no parsable device rows")
        return
    rows.sort(key=lambda r: -r["self_us"])
    total = sum(r["self_us"] for r in rows)
    print(f"# total self time: {total/1e3:.2f} ms over {args.iters} iters "
          f"({total/1e3/args.iters:.3f} ms/iter)")
    print(f"{'self_ms':>9} {'%':>5} {'n':>5}  op (category)")
    for r in rows[:args.top]:
        print(f"{r['self_us']/1e3:9.2f} {100*r['self_us']/total:5.1f} "
              f"{r['occurrences']:5d}  {r['op'][:110]} ({r['category']})")
    cats = {}
    for r in rows:
        cats[r["category"]] = cats.get(r["category"], 0.0) + r["self_us"]
    print("\n# by category")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:9.2f} {100*us/total:5.1f}  {c}")


if __name__ == "__main__":
    main()
