#!/usr/bin/env python
"""Benchmark: two-hand 512px end-to-end inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 60 FPS (BASELINE.md — ">60 FPS two-hand 512px
inference on one v5e chip"), so vs_baseline = fps / 60.

Measures the full jitted chain (backbone -> heads -> parser -> MANO ->
projection -> translation solve) at batch 1 (latency path), after
compile warmup. Uses real assets when present, synthetic otherwise.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    import jax
    import numpy as np

    # persistent compile cache: the 512px program takes minutes to build
    # cold; cached reruns start in seconds
    cache_dir = os.environ.get("ACR_COMPILE_CACHE",
                               os.path.join(REPO, ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import __graft_entry__ as ge

    ge._ensure_assets()
    # defaults = the per-chip throughput sweet spot (BASELINE.md's metric
    # is ">60 FPS per chip"); ACR_BENCH_PRECISION=fp32 ACR_BENCH_BATCH=1
    # measures the latency/demo-default config (see docs/PERFORMANCE.md)
    precision = os.environ.get("ACR_BENCH_PRECISION", "bf16")
    batch = int(os.environ.get("ACR_BENCH_BATCH", "8"))
    fn, cfg = ge._build(512, precision=precision)

    image = np.random.RandomState(0).randint(
        0, 255, (batch, 512, 512, 3)).astype(np.uint8)
    offsets = np.tile(np.array(
        [[512, 512, 0, 0, 0, 0, 0, 0, 0, 0]], np.float32), (batch, 1))

    jfn = jax.jit(fn)
    img_d = jax.device_put(image)
    off_d = jax.device_put(offsets)

    # compile + warmup
    out = jfn(img_d, off_d)
    jax.block_until_ready(out)
    for _ in range(3):
        jax.block_until_ready(jfn(img_d, off_d))

    iters = int(os.environ.get("ACR_BENCH_ITERS", "30"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(img_d, off_d)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = iters * batch / dt

    print(json.dumps({
        "metric": f"two_hand_512px_inference_fps_b{batch}_{precision}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
