#!/usr/bin/env python
"""Build the committed int8 default-calibration set (model_data/calib).

Round-4 review item: the int8 path's load-time calibration used two
synthetic frames (uniform noise + mid-gray) and the measured
default-recipe error sat at the 1% vertex budget with no margin
(docs/PERFORMANCE.md quantization ledger). This tool derives a small
REAL-frame set from the reference demo photo
(/root/reference/demo/magic.jpg — a real two-hand image, the same
anchor the parity/accuracy harnesses use) plus deterministic
photometric/geometric variants, each pushed through the SAME
img_preprocess the serving path runs, and appends the two synthetic
structural bounds (uniform noise + mid-gray) so activation ranges stay
bounded even for out-of-distribution inputs.

Output: model_data/calib/calib_frames.npz with
  frames  (N, S, S, 3) uint8 — ready network inputs
  names   (N,) str — provenance per frame
committed to the repo; ops/quant.committed_calibration_frames loads it
as the default calibration set (ACRPipeline.calibrate(real_frames)
still overrides for deployment-specific recalibration).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAGIC = "/root/reference/demo/magic.jpg"


def derive_variants(bgr: np.ndarray):
    """Deterministic variants covering both pad branches, both
    horizontal hand orders, scale and exposure shifts."""
    rng = np.random.RandomState(0)
    h, w = bgr.shape[:2]
    yield "magic", bgr
    yield "magic_flip", bgr[:, ::-1]
    yield "magic_wide", bgr[:, : int(w * 0.73)]          # pad-height branch
    tall = bgr[100:, 600:1100].astype(np.int16)
    tall = tall + (rng.randn(*tall.shape) * 3).astype(np.int16)
    yield "magic_tall_noise", np.clip(tall, 0, 255).astype(np.uint8)
    yield "magic_bright", np.clip(
        bgr.astype(np.int16) + 40, 0, 255).astype(np.uint8)
    yield "magic_dark", np.clip(
        bgr.astype(np.int16) - 40, 0, 255).astype(np.uint8)
    import cv2
    yield "magic_half", cv2.resize(bgr, (w // 2, h // 2),
                                   interpolation=cv2.INTER_AREA)


def build(input_size: int = 512):
    from acr_tpu.pipeline.preprocess import img_preprocess

    import cv2
    bgr = cv2.imread(MAGIC)
    assert bgr is not None, f"reference demo image missing: {MAGIC}"

    frames, names = [], []
    for name, img in derive_variants(bgr):
        meta = img_preprocess(img, name, input_size=input_size)
        frames.append(np.asarray(meta["image"][0], np.uint8))
        names.append(name)
    # structural bounds (the former synthetic-only default,
    # ops/quant.default_calibration_frames): keep activation scales
    # valid for inputs far outside the photo's distribution
    r = np.random.RandomState(0)
    frames.append(r.randint(0, 255, (input_size, input_size, 3)
                            ).astype(np.uint8))
    names.append("uniform_noise")
    frames.append(np.full((input_size, input_size, 3), 127, np.uint8))
    names.append("mid_gray")
    return np.stack(frames), np.array(names)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input_size", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(
        REPO, "model_data", "calib", "calib_frames.npz"))
    args = ap.parse_args(argv)

    frames, names = build(args.input_size)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, frames=frames, names=names,
                        source=MAGIC)
    print(f"wrote {args.out}: {frames.shape} uint8, "
          f"{os.path.getsize(args.out) / 1e6:.2f} MB, frames: "
          + ", ".join(names))


if __name__ == "__main__":
    main()
