#!/usr/bin/env python
"""Per-op profile of the end-to-end inference step on the TPU.

Captures a ``jax.profiler`` trace of the jitted 512px program and prints
the top ops by self time (xprof framework_op_stats), plus a category
rollup — the data that drives lane-utilization work like models/s2d.py.

Usage:
    python tools/profile_step.py [--precision bf16] [--batch 8]
                                 [--iters 20] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(precision: str, batch: int, iters: int, trace_dir: str) -> None:
    import jax
    import numpy as np
    import __graft_entry__ as ge

    cache_dir = os.environ.get("ACR_COMPILE_CACHE",
                               os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    ge._ensure_assets()
    fn, cfg = ge._build(512, precision=precision,
                        quantize=os.environ.get("ACR_BENCH_QUANT", "none"))
    image = np.random.RandomState(0).randint(
        0, 255, (batch, 512, 512, 3)).astype(np.uint8)
    offsets = np.tile(np.array(
        [[512, 512, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32), (batch, 1))
    jfn = jax.jit(fn)
    img_d, off_d = jax.device_put(image), jax.device_put(offsets)
    out = jfn(img_d, off_d)
    float(np.asarray(out["cam_trans"]).sum())        # compile + drain
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = jfn(img_d, off_d)
        float(np.asarray(out["cam_trans"]).sum())    # force inside trace


def find_xspace(trace_dir: str) -> str:
    pats = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True)
    if not pats:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    return max(pats, key=os.path.getmtime)


def op_stats(xspace: str):
    """Device-op rows from xprof framework_op_stats (gviz JSON)."""
    from xprof.convert import raw_to_tool_data as rttd
    data, _ = rttd.xspace_to_tool_data([xspace], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)[0]
    cols = [c["id"] for c in table["cols"]]
    ci = {name: i for i, name in enumerate(cols)}
    out = []
    for row in table["rows"]:
        vals = [c.get("v") if isinstance(c, dict) else None for c in row["c"]]
        if vals[ci["host_or_device"]] != "Device":
            continue
        out.append({
            "op": vals[ci["operation"]],
            "category": vals[ci["type"]],
            "self_us": float(vals[ci["total_self_time"]]),
            "occurrences": int(vals[ci["occurrences"]] or 0),
        })
    return cols, out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace_dir", default="/tmp/acr_profile")
    ap.add_argument("--reuse", action="store_true",
                    help="skip capture; analyze an existing trace_dir")
    args = ap.parse_args(argv)

    if not args.reuse:
        capture(args.precision, args.batch, args.iters, args.trace_dir)
    xspace = find_xspace(args.trace_dir)
    print(f"# xspace: {xspace}")
    header, rows = op_stats(xspace)
    if not rows:
        print("no parsable rows; header was:", header)
        return
    rows.sort(key=lambda r: -r["self_us"])
    total = sum(r["self_us"] for r in rows)
    print(f"# total self time: {total/1e3:.2f} ms over {args.iters} iters "
          f"({total/1e3/args.iters:.3f} ms/iter)")
    print(f"{'self_ms':>9} {'%':>5} {'n':>5}  op (category)")
    for r in rows[:args.top]:
        print(f"{r['self_us']/1e3:9.2f} {100*r['self_us']/total:5.1f} "
              f"{r['occurrences']:5d}  {r['op'][:90]} ({r['category']})")
    cats = {}
    for r in rows:
        cats[r["category"]] = cats.get(r["category"], 0.0) + r["self_us"]
    print("\n# by category")
    for c, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:9.2f} {100*us/total:5.1f}  {c}")


if __name__ == "__main__":
    main()
