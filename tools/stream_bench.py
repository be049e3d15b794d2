#!/usr/bin/env python
"""Interactive-path latency: p50/p90 ms/frame over a synthetic stream.

Runs the full webcam stack (preprocess -> jitted forward -> OneEuro ->
refine -> render -> composite, one device readback per frame) on an
N-frame synthetic 640x480 source and prints percentile latencies.
On this relayed terminal the number is transport-floor-bound
(docs/PERFORMANCE.md); on a directly-attached host it approaches the
device step time.

Usage: python tools/stream_bench.py [--frames 80] [--precision fp32]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--precision", default="fp32")
    ap.add_argument("--quantize", default="none")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ACR_COMPILE_CACHE",
                                     os.path.join(REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import numpy as np
    import __graft_entry__ as ge
    ge._ensure_assets()

    from acr_tpu.config import Config
    from acr_tpu.pipeline.app import ACRApp
    from acr_tpu.pipeline.streaming import StreamingLoop, SyntheticSource

    cfg = Config(mano_model_path=ge.MANO_DIR, model_path=ge.CKPT,
                 model_precision=args.precision, quantize=args.quantize,
                 renderer="tpu", demo_mode="webcam",
                 temporal_optimization=True, output_dir="/tmp/stream_bench/")
    app = ACRApp(cfg)
    # warmup/compile outside the measured stream
    warm = StreamingLoop(app, max_frames=3)
    warm.run(SyntheticSource(3))

    loop = StreamingLoop(app)
    n = loop.run(SyntheticSource(args.frames))
    lat = np.asarray(loop.latencies)       # already milliseconds
    print(f"{n} frames  p50={np.percentile(lat, 50):.1f} ms  "
          f"p90={np.percentile(lat, 90):.1f} ms  "
          f"mean={lat.mean():.1f} ms")


if __name__ == "__main__":
    main()
