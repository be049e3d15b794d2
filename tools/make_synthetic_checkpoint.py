#!/usr/bin/env python
"""Create a random-weight acr_tpu checkpoint npz for tests and benches.

The real checkpoint is a registered download (reference README.md:41);
this provides a structurally identical stand-in so the full pipeline
(and the driver's bench) runs without it. Weights are seeded/deterministic.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="checkpoints/wild.npz")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from acr_tpu.models.acr import ACRNet
    from acr_tpu.io.params import save_params_npz

    net = ACRNet()
    params = net.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1, 512, 512, 3), jnp.uint8))

    # Random init has no BatchNorm statistics, so deep residual stacks
    # blow up (the 1.1^x camera-scale then overflows). Emulate a trained
    # network's normalization by damping every folded-BN scale.
    def damp(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if names[-1] == "scale":
            return leaf * 0.2
        # lift center-heatmap outputs above the 0.35 confidence threshold
        # so synthetic-weight runs still produce detections
        if len(names) >= 3 and names[-3].endswith("center_head") and \
                names[-2] == "out" and names[-1] == "bias":
            return leaf + 0.5
        return leaf

    params = jax.tree_util.tree_map_with_path(damp, params)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_params_npz(args.out, params)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"wrote {args.out} ({n/1e6:.2f}M params)")


if __name__ == "__main__":
    main()
