#!/usr/bin/env python
"""Quantify the int8 (W8A8) serving path's END-TO-END accuracy.

The int8 path (ops/quant.py, ``Config.quantize='int8'|'int8_pc'``) is
an approximation; this tool measures what that approximation costs in
OUTPUT space — the space users consume — rather than on intermediate
maps:

* mean / max per-vertex displacement of the 778-vertex mesh, absolute
  (MANO model units, metres) and relative to the hand's bbox diagonal;
* mean 3D joint displacement (21 joints);
* mean / max projected-2D joint error in input pixels (512px frame);
* detection-flag flips at the 0.35 center-confidence threshold
  (reference: acr/config.py:131) and the worst confidence delta;
* camera / translation drift.

Evaluated for each quant mode under two calibration recipes:
(a) DEFAULT — whatever load-time calibration resolves to (the
COMMITTED real-frame set model_data/calib when present —
ops/quant.committed_calibration_frames — else the synthetic
noise+mid-gray pair); (b) FRAMES — the evaluation frames themselves
(the deployment-specific recipe: ``ACRPipeline.calibrate(frames)``).

Frames: ``/root/reference/demo/magic.jpg`` (a real two-hand photo)
when the reference tree is present, plus deterministic synthetic
frames. Weights: ``checkpoints/wild.npz`` by default;
``--reference_init`` instead converts a freshly-initialized reference
torch model's state_dict (realistic per-layer weight statistics,
the same fixture as tests/test_reference_model_parity.py).

Prints a markdown table and writes JSON with ``--json_out``. The
measured numbers (and the opt-in/default decision they support) live
in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Tuple

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAGIC = "/root/reference/demo/magic.jpg"


def build_frames(input_size: int, n_synth: int = 2) -> List[Tuple[str, Dict]]:
    """(name, preprocessed meta) eval set: real photo + synthetic."""
    from acr_tpu.pipeline.preprocess import img_preprocess
    frames = []
    if os.path.exists(MAGIC):
        import cv2
        bgr = cv2.imread(MAGIC)
        if bgr is not None:
            frames.append(("magic.jpg",
                           img_preprocess(bgr, MAGIC, input_size=input_size)))
    rng = np.random.RandomState(7)
    for i in range(n_synth):
        bgr = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        frames.append((f"synthetic_{i}",
                       img_preprocess(bgr, f"synthetic_{i}",
                                      input_size=input_size)))
    return frames


def _forward_all(pipe, frames):
    outs = []
    for _, meta in frames:
        out = pipe(meta["image"], meta["offsets"])
        import jax
        outs.append(jax.device_get(out))
    return outs


def compare_outputs(ref_outs: List[Dict], q_outs: List[Dict],
                    input_size: int) -> Dict[str, float]:
    """Aggregate error metrics across frames/hands (float pipeline =
    ground truth)."""
    v_disp, v_rel, j_disp, p_err, t_err = [], [], [], [], []
    flips = 0
    conf_delta = 0.0
    for ref, q in zip(ref_outs, q_outs):
        fv = np.asarray(ref["verts"], np.float64)     # (B,2,778,3)
        qv = np.asarray(q["verts"], np.float64)
        dv = np.linalg.norm(qv - fv, axis=-1)          # (B,2,778)
        diag = np.linalg.norm(fv.max(-2) - fv.min(-2), axis=-1)  # (B,2)
        v_disp.append(dv)
        v_rel.append(dv / np.maximum(diag[..., None], 1e-9))
        j_disp.append(np.linalg.norm(
            np.asarray(q["j3d"], np.float64)
            - np.asarray(ref["j3d"], np.float64), axis=-1))
        # pj2d is in [-1, 1]; scale to input pixels
        p_err.append(np.linalg.norm(
            np.asarray(q["pj2d"], np.float64)
            - np.asarray(ref["pj2d"], np.float64), axis=-1)
            * (input_size / 2.0))
        t_err.append(np.linalg.norm(
            np.asarray(q["cam_trans"], np.float64)
            - np.asarray(ref["cam_trans"], np.float64), axis=-1))
        flips += int((np.asarray(q["detection_flag"])
                      != np.asarray(ref["detection_flag"])).sum())
        conf_delta = max(conf_delta, float(np.abs(
            np.asarray(q["centers_conf"], np.float64)
            - np.asarray(ref["centers_conf"], np.float64)).max()))
    v_disp = np.concatenate([a.ravel() for a in v_disp])
    v_rel = np.concatenate([a.ravel() for a in v_rel])
    j_disp = np.concatenate([a.ravel() for a in j_disp])
    p_err = np.concatenate([a.ravel() for a in p_err])
    t_err = np.concatenate([a.ravel() for a in t_err])
    return {
        "vert_disp_mean": float(v_disp.mean()),
        "vert_disp_max": float(v_disp.max()),
        "vert_rel_mean_pct": float(v_rel.mean() * 100.0),
        "vert_rel_max_pct": float(v_rel.max() * 100.0),
        "j3d_disp_mean": float(j_disp.mean()),
        "pj2d_err_mean_px": float(p_err.mean()),
        "pj2d_err_max_px": float(p_err.max()),
        "cam_trans_err_mean": float(t_err.mean()),
        "detection_flips": flips,
        "center_conf_delta_max": float(conf_delta),
    }


def run_eval(params, input_size: int = 512,
             modes: Tuple[str, ...] = ("int8", "int8_pc"),
             mano_dir: str = None, n_synth: int = 2) -> Dict[str, Dict]:
    """Float-vs-quantized comparison for each (mode, calibration).

    ``params`` is a float (pre-s2d) param tree or None (load from the
    default checkpoint path). Returns {"<mode>/<calib>": metrics}.
    """
    from acr_tpu.config import Config
    from acr_tpu.pipeline.infer import ACRPipeline

    mano_dir = mano_dir or os.path.join(REPO, "model_data", "mano")
    base = dict(input_size=input_size, mano_model_path=mano_dir,
                model_path=os.path.join(REPO, "checkpoints", "wild.npz"))
    frames = build_frames(input_size, n_synth=n_synth)

    def fresh(p):
        # ACRPipeline pops parser-owned subtrees from the tree it is
        # given; rebuild the dict structure so pipelines don't alias
        if p is None:
            return None
        import jax
        return jax.tree.map(lambda x: x, p)

    float_pipe = ACRPipeline(Config(**base), params=fresh(params))
    ref_outs = _forward_all(float_pipe, frames)

    results: Dict[str, Dict] = {}
    for mode in modes:
        qpipe = ACRPipeline(Config(quantize=mode, **base),
                            params=fresh(params))
        results[f"{mode}/default"] = compare_outputs(
            ref_outs, _forward_all(qpipe, frames), input_size)
        # production recipe: calibrate on the frames being served
        qpipe.calibrate([meta["image"] for _, meta in frames])
        results[f"{mode}/frames"] = compare_outputs(
            ref_outs, _forward_all(qpipe, frames), input_size)
    return results


def reference_init_params():
    """Convert a freshly-initialized reference torch model's
    state_dict -> our param tree (realistic per-layer weight
    statistics; same recipe as the tests/test_reference_model_parity
    fixture)."""
    import types
    injected = []
    for name in ("imgaug", "imgaug.augmenters", "h5py", "chumpy"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
                injected.append(name)
    aug = sys.modules["imgaug.augmenters"]
    for attr in ("Sequential", "Crop", "Pad"):
        if not hasattr(aug, attr):
            setattr(aug, attr, lambda *a, **k: None)
    if not hasattr(aug, "compute_paddings_to_reach_aspect_ratio"):
        aug.compute_paddings_to_reach_aspect_ratio = \
            lambda *a, **k: (0, 0, 0, 0)
    argv_backup, sys.argv = sys.argv, ["prog"]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import torch
        torch.manual_seed(0)
        from acr.model import ACR as RefACR
        model = RefACR().eval()
    finally:
        sys.argv = argv_backup
    from tools.convert_checkpoint import convert_state_dict, \
        enumerate_flax_paths
    from acr_tpu.io.params import unflatten_params
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    flat, _, missing = convert_state_dict(sd, enumerate_flax_paths())
    assert not missing, missing
    params = unflatten_params(flat)
    return bias_detection(params)


def bias_detection(params, bias: float = 0.5):
    """Shift the center-head output bias so random-init weights still
    produce detections (the detection-flip metric needs confidences
    that clear the 0.35 threshold); conv weight statistics untouched."""
    import jax
    import jax.numpy as jnp

    def fix(path, x):
        names = [getattr(q, "key", "") for q in path]
        if len(names) >= 3 and names[-3].endswith("center_head") \
                and names[-2] == "out" and names[-1] == "bias":
            return x + bias
        return x
    return jax.tree_util.tree_map_with_path(fix, params)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input_size", type=int, default=512)
    ap.add_argument("--modes", nargs="+", default=["int8", "int8_pc"])
    ap.add_argument("--reference_init", action="store_true",
                    help="use converted reference-init weights instead "
                         "of checkpoints/wild.npz")
    ap.add_argument("--n_synth", type=int, default=2)
    ap.add_argument("--json_out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the terminal overrides "
                         "JAX_PLATFORMS at interpreter start)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("ACR_COMPILE_CACHE",
                                     os.path.join(REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    params = reference_init_params() if args.reference_init else None
    results = run_eval(params, input_size=args.input_size,
                       modes=tuple(args.modes), n_synth=args.n_synth)

    cols = ["vert_rel_mean_pct", "vert_rel_max_pct", "j3d_disp_mean",
            "pj2d_err_mean_px", "pj2d_err_max_px", "detection_flips",
            "center_conf_delta_max"]
    hdr = "| config | " + " | ".join(cols) + " |"
    print(hdr)
    print("|" + "---|" * (len(cols) + 1))
    for name, m in results.items():
        row = [name] + [f"{m[c]:.4g}" if isinstance(m[c], float)
                        else str(m[c]) for c in cols]
        print("| " + " | ".join(row) + " |")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json_out}")
    return results


if __name__ == "__main__":
    main()
