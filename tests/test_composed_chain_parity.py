"""WHOLE-APP composed-chain parity vs the reference (round-4 item).

Per-stage parity (activations, parser, MANO, OneEuro, projection,
rotations) lives in test_reference_model_parity.py; this module runs the
reference's full per-frame stack AS ONE CHAIN —

    img_preprocess -> ACR.forward (backbone+heads+parser) ->
    justify_detection_state -> smooth_results (-t) -> MANOWrapper ->
    vertices_kp3d_projection -> reorganize_results
    (reference: acr/main.py:92-141, 66-89)

— against our shipped composed paths on the same frames with the same
converted random-init weights and the same synthetic MANO assets:

  * the fused webcam stream step (ACRApp.stream_step: forward + OneEuro
    + MANO refine in ONE jitted dispatch), compared in fp32;
  * ACRApp.process_frame (image/folder path), compared on the fp16
    reference-format results dicts.

Composition bugs (offset conventions, smooth->refine ordering,
detection-flag plumbing, preprocessing byte drift) are exactly what
per-stage tests miss; three frames with -t pin the stateful ordering.

Environment notes: the reference needs imgaug + chumpy (absent) —
tests/ref_stubs.py provides functional stand-ins so its real code runs;
`.cuda()` is patched to a no-op; `np.float` (numpy<=1.23-ism,
acr/utils.py:493) is aliased; estimate_translation_cv2 is patched to
raise so the reference takes its own documented numpy-WLS fallback
(acr/utils.py:512-517) — the RANSAC contract is covered separately by
tests/test_native.py. Skipped when the reference tree is absent.
"""

import os
import pickle
import sys

import numpy as np
import pytest

from tests.ref_stubs import (
    install_functional_chumpy,
    install_functional_imgaug,
    restore_modules,
)

REFERENCE = "/root/reference"
CONF_THRESH = -1e4       # force both-hands detection with random weights
SMOOTH = 4.0

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree unavailable")


# --------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """The reference's composed stack, runnable on CPU: model (seed 0),
    MANOWrapper on synthetic pkls, utils module, with compat patches."""
    install_functional_imgaug()
    chumpy_backup = install_functional_chumpy()

    argv_backup = sys.argv
    sys.argv = ["prog"]
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    import torch
    cuda_backup = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if not hasattr(np, "float"):
        np.float = float                     # acr/utils.py:493 numpy<=1.23-ism

    try:
        import cv2
        import mano.manolayer as ref_manolayer
        ref_manolayer.cv2 = cv2              # unimported name in its numpy path
        torch.manual_seed(0)
        from acr.model import ACR as RefACR
        import acr.utils as ref_utils
        from acr.mano_wrapper import MANOWrapper

        model = RefACR().eval()
        model._result_parser.centermap_parser.conf_thresh = CONF_THRESH

        # synthetic MANO pkls (download format: raw left shapedirs — the
        # wrapper applies the runtime x-flip, acr/mano_wrapper.py:35)
        from tests.test_ingest import make_chumpy_style_pkl
        from tools.make_synthetic_mano import make_assets
        pkl_root = tmp_path_factory.mktemp("ref_assets")
        (pkl_root / "mano").mkdir()
        for side, name in (("left", "MANO_LEFT.pkl"),
                           ("right", "MANO_RIGHT.pkl")):
            assets = dict(make_assets(side, seed=0))
            if side == "left":
                assets["shapedirs"] = assets["shapedirs"].copy()
                assets["shapedirs"][:, 0, :] *= -1
            with open(pkl_root / "mano" / name, "wb") as f:
                pickle.dump(make_chumpy_style_pkl(assets), f)

        cwd = os.getcwd()
        os.chdir(pkl_root)                   # ManoLayer mano_root='mano/'
        try:
            wrapper = MANOWrapper()
        finally:
            os.chdir(cwd)

        # force the reference's own WLS fallback (acr/utils.py:512-517)
        cv2_backup = ref_utils.estimate_translation_cv2

        def _no_ransac(*a, **k):
            raise RuntimeError("forced fallback to estimate_translation_np")

        ref_utils.estimate_translation_cv2 = _no_ransac

        yield {"torch": torch, "model": model, "wrapper": wrapper,
               "utils": ref_utils, "pkl_dir": str(pkl_root / "mano")}
        ref_utils.estimate_translation_cv2 = cv2_backup
    finally:
        sys.argv = argv_backup
        torch.Tensor.cuda = cuda_backup
        restore_modules(chumpy_backup)


@pytest.fixture(scope="module")
def converted(ref_env, tmp_path_factory):
    """Weights converted FROM the reference instance (flat dict — each
    consumer unflattens its own copy, since ACRPipeline pops the parser
    subtree out of the tree it is given) and MANO npz converted FROM
    the same pkls the reference loaded."""
    from tools.convert_mano import main as convert_mano_main
    from tools.convert_checkpoint import convert_state_dict, \
        enumerate_flax_paths

    npz_dir = str(tmp_path_factory.mktemp("mano_npz"))
    convert_mano_main(["--mano_dir", ref_env["pkl_dir"],
                       "--out_dir", npz_dir])

    ref_sd = {k: v.detach().numpy().copy()       # .copy(): no live views
              for k, v in ref_env["model"].state_dict().items()}
    flat, _, missing = convert_state_dict(ref_sd, enumerate_flax_paths())
    assert not missing
    return {"npz_dir": npz_dir, "flat": flat}


def _build_app(converted, conf_thresh):
    from acr_tpu.io.params import unflatten_params
    from acr_tpu.config import Config
    from acr_tpu.pipeline.app import ACRApp

    cfg = Config(mano_model_path=converted["npz_dir"],
                 temporal_optimization=True,
                 save_visualization_on_img=False,
                 centermap_conf_thresh=conf_thresh,
                 smooth_coeff=SMOOTH)
    return ACRApp(cfg, params=unflatten_params(dict(converted["flat"])))


@pytest.fixture(scope="module")
def our_app(converted):
    """ACRApp on the converted weights with detection forced."""
    return _build_app(converted, CONF_THRESH)


@pytest.fixture(scope="module")
def frames(rng):
    """magic.jpg + two temporally-correlated variants with different
    aspect ratios (both pad branches). BGR uint8, as cv2.imread
    delivers. Correlated frames keep the -t comparison in the regime
    the filter is designed for: with UNcorrelated noise frames the
    orient swings wildly and the reference's matrix-space smoothing
    produces far-from-SO(3) matrices whose axis-angle conversion
    amplifies ~5e-6 fp drift to ~3e-2 (measured) — an ill-conditioned
    edge of the reference's own design, not a composition property."""
    import cv2
    magic = cv2.imread(os.path.join(REFERENCE, "demo", "magic.jpg"))
    assert magic is not None
    wide = magic[:, :1400]                              # pad-height branch
    tall = np.clip(magic[100:, 600:1100].astype(np.int16)
                   + (rng.randn(980, 500, 3) * 3).astype(np.int16),
                   0, 255).astype(np.uint8)             # pad-width branch
    return [(magic, "magic.jpg"), (wide, "wide.jpg"), (tall, "tall.jpg")]


def ref_chain(env, filters, bgr, path, temporal=True,
              require_detection=True):
    """The reference per-frame stack, faithfully composed
    (acr/main.py:92-141: single_image_forward -> process_results)."""
    torch, utils = env["torch"], env["utils"]
    meta = utils.img_preprocess(bgr.copy(), path, input_size=512,
                                single_img_input=True)
    meta.pop("data_set"), meta.pop("imgpath")    # get_remove_keys, main.py:129
    meta["batch_ids"] = torch.arange(1)
    with torch.no_grad():
        outputs = env["model"](meta, mode="parsing", calc_loss=False)
    outputs["detection_flag"], outputs["reorganize_idx"] = \
        utils.justify_detection_state(outputs["detection_flag"],
                                      outputs["reorganize_idx"])
    outputs["meta_data"]["imgpath"] = [path]
    if require_detection:
        assert outputs["detection_flag"], "forced-low threshold must detect"
    elif not outputs["detection_flag"]:
        # no hand at all: the reference emits the raw frame and an empty
        # results entry, never running the wrapper (main.py:111-120)
        return outputs, {path: {}}
    if temporal:                                  # main.py:69-83
        pd = outputs["params_dict"]
        for sid, flag in enumerate(outputs["detection_flag_cache"]):
            if not flag:
                continue
            pd["poses"][sid], pd["betas"][sid] = utils.smooth_results(
                filters[sid], pd["poses"][sid], pd["betas"][sid])
    outputs = env["wrapper"](outputs, outputs["meta_data"])
    results = utils.reorganize_results(
        outputs, outputs["meta_data"]["imgpath"],
        outputs["reorganize_idx"].cpu().numpy())
    return outputs, results


@pytest.fixture(scope="module")
def ref_runs(ref_env, frames):
    """Reference chain over the 3 frames with fresh OneEuro filters."""
    filters = {0: ref_env["utils"].create_OneEuroFilter(SMOOTH),
               1: ref_env["utils"].create_OneEuroFilter(SMOOTH)}
    return [ref_chain(ref_env, filters, bgr, path)
            for bgr, path in frames]


# ----------------------------------------------------------------- tests

def test_preprocess_bytes_identical(ref_env, frames):
    """Our numpy preprocessing must produce the reference's exact bytes
    (pad-to-square white bg + uint8 cubic resize + offsets) — the
    'uint8-cubic-resize sensitivity' hard part, SURVEY.md §7(f)."""
    from acr_tpu.pipeline.preprocess import img_preprocess
    for bgr, path in frames:
        ref_meta = ref_env["utils"].img_preprocess(
            bgr.copy(), path, input_size=512, single_img_input=True)
        ours = img_preprocess(bgr, path, input_size=512)
        np.testing.assert_array_equal(ours["image"][0],
                                      ref_meta["image"][0].numpy(),
                                      err_msg=path)
        np.testing.assert_array_equal(ours["offsets"][0],
                                      ref_meta["offsets"][0].numpy(),
                                      err_msg=path)


# Measured composed-chain divergence (random-init weights, CPU, 3 frames
# with -t): params 8.9e-7, poses 2.6e-6, betas 4.9e-7, cam 4.5e-7, verts
# 1.6e-7, j3d 1.2e-7, pj2d 3.0e-7, pj2d_org 2.4e-4 px, cam_trans 3.0e-5.
# Tolerances are pinned ~40-100x above those maxima — still 10x tighter
# than the 1e-3-verts north star (SURVEY.md §4).
TOLS = {
    "params": 1e-4,      # sampled 109-vectors (pre-6D-decode)
    "poses": 1e-4,       # axis-angle, rad
    "betas": 1e-4,
    "cam": 1e-4,
    "verts": 1e-4,       # north star: <1e-3 m
    "j3d": 1e-4,
    "pj2d": 1e-4,        # normalized [-1,1]
    "pj2d_org": 1e-2,    # px on the original frame (up to 1920 wide)
    "cam_trans": 1e-3,   # fp32 QR vs the reference's fp64 WLS
}


def _ref_stack(out_ref, key):
    """Reference per-hand arrays come as one (2, ...) cat [left; right]."""
    v = out_ref[key]
    return v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)


def test_composed_chain_stream_parity(ref_env, our_app, frames, ref_runs):
    """Fused stream step (forward+OneEuro+refine, one dispatch) vs the
    reference stack, fp32, 3 frames with -t."""
    from acr_tpu.pipeline.preprocess import img_preprocess
    from acr_tpu.pipeline.temporal import init_two_hand_filter

    our_app.filter_state = init_two_hand_filter()
    report = {}
    for (bgr, path), (out_ref, _) in zip(frames, ref_runs):
        meta = img_preprocess(bgr, path, input_size=512)
        out = our_app.unpack_stream(our_app.stream_step(meta))

        # detection flags + centers first: divergence here invalidates
        # everything downstream
        assert np.asarray(out["detection_flag"][0]).tolist() == \
            [bool(f) for f in out_ref["detection_flag_cache"]], path
        ref_centers = np.stack([_ref_stack(out_ref, "l_centers_pred")[0],
                                _ref_stack(out_ref, "r_centers_pred")[0]])
        np.testing.assert_array_equal(np.asarray(out["centers"][0]),
                                      ref_centers, err_msg=path)

        pd = out_ref["params_dict"]
        ref_vals = {
            "params": _ref_stack(out_ref, "params_pred"),
            "poses": pd["poses"].numpy(),
            "betas": pd["betas"].numpy(),
            "cam": pd["cam"].numpy(),
            "verts": _ref_stack(out_ref, "verts"),
            "j3d": _ref_stack(out_ref, "j3d"),
            "pj2d": _ref_stack(out_ref, "pj2d"),
            "pj2d_org": _ref_stack(out_ref, "pj2d_org"),
            "cam_trans": _ref_stack(out_ref, "cam_trans"),
        }
        for key, want in ref_vals.items():
            got = np.asarray(out[key][0], np.float64)
            err = np.abs(got - np.asarray(want, np.float64)).max()
            report[key] = max(report.get(key, 0.0), err)
            assert err < TOLS[key], \
                f"{path}/{key}: max abs err {err:.2e} >= {TOLS[key]:.0e}"
    print("composed-chain max abs err per key:",
          {k: f"{v:.2e}" for k, v in report.items()})


def test_composed_chain_process_frame_parity(ref_env, our_app, frames,
                                             ref_runs):
    """ACRApp.process_frame (image/folder path) vs the reference's
    reorganize_results dicts — same fp16 reference format, fresh
    filters on both sides."""
    from acr_tpu.pipeline.temporal import init_two_hand_filter

    our_app.filter_state = init_two_hand_filter()
    our_app.cfg.save_visualization_on_img = False
    for (bgr, path), (_, ref_results) in zip(frames, ref_runs):
        ours = our_app.process_frame(bgr, path)
        assert set(ours) == set(ref_results) == {path}
        ref_hands, our_hands = ref_results[path], ours[path]
        assert len(our_hands) == len(ref_hands) == 2
        for got, want in zip(our_hands, ref_hands):
            assert int(got["hand_type"]) == int(want["hand_type"])
            assert bool(got["detection_flag_cache"]) == \
                bool(want["detection_flag_cache"])
            for key, tol in TOLS.items():
                if key == "params":
                    continue                     # not in the results dict
                g = np.asarray(got[key], np.float64)
                w = np.asarray(want[key], np.float64)
                assert g.shape == w.shape, (path, key)
                # fp16 storage adds up to 1 ulp at the value's scale on
                # top of the fp32 drift budget
                ulp = float(np.spacing(np.float16(np.abs(w).max())))
                assert np.abs(g - w).max() < tol + 2 * ulp, \
                    f"{path}/{key}: {np.abs(g - w).max():.2e}"


# ------------------------------------------- missing-hand fallback chain

@pytest.fixture(scope="module")
def split_setup(ref_runs):
    """A weight-space perturbation that makes detection genuinely vary.

    Why a bias shift and not a threshold between the two maps' maxima:
    random-init center maps are ALL-NEGATIVE, and the reference NMS
    keeps `det * (maxm == det)` (acr/result_parser.py:209-216) — the
    suppressed pixels become 0.0 > every negative peak, so the top-1
    score of the K=1 adaptive-scale parse (result_parser.py:218-243)
    is 0.0 for BOTH hands on EVERY frame; no confidence threshold can
    split them. Shifting a center head's final-conv bias
    (l/r_final_layers[2][-1], a biased 1x1 conv — acr/model.py:310-311)
    moves that hand's whole map uniformly: argmax, NMS structure,
    sampled locations and params are all unchanged, only the detection
    score moves — and the same shift flows through the checkpoint
    converter into our stack, so both stacks decide identically.

    One hand is pinned always-detected (min peak shifted to 1.0); the
    other straddles a 0.5 threshold — its lowest-peak frame lands below,
    the rest above, and the frames are ordered detected -> missing ->
    detected so the miss pins OneEuro state preservation ACROSS it."""
    l_peaks = np.array([float(o["l_center_map"].max()) for o, _ in ref_runs])
    r_peaks = np.array([float(o["r_center_map"].max()) for o, _ in ref_runs])
    peak_gap = lambda p: float(np.sort(p)[1] - np.sort(p)[0])
    # straddler = hand with the larger gap between its two lowest
    # per-frame peaks (the decision margin at the 0.5 threshold)
    straddle = 0 if peak_gap(l_peaks) > peak_gap(r_peaks) else 1
    sp = (l_peaks, r_peaks)[straddle]
    pinned = (l_peaks, r_peaks)[1 - straddle]
    order = np.argsort(sp)
    lo, second = float(sp[order[0]]), float(sp[order[1]])
    # both stacks' peaks agree to ~1e-6 (TOLS preamble); >=1e-3 margin
    # on each side of 0.5 keeps the detection decisions identical
    assert second - lo > 2e-3, f"peaks too close to split: {sp}"
    shifts = [0.0, 0.0]
    shifts[straddle] = 0.5 - (lo + second) / 2.0
    shifts[1 - straddle] = 1.0 - float(pinned.min())
    frame_order = [int(order[1]), int(order[0]), int(order[2])]
    expected = []
    for i in frame_order:
        f = [True, True]
        f[straddle] = bool(sp[i] + shifts[straddle] > 0.5)
        expected.append(f)
    assert [sum(f) for f in expected] == [2, 1, 2], expected
    return {"shifts": shifts, "frame_order": frame_order,
            "expected": expected}


def test_composed_chain_missing_hand(ref_env, converted, frames, ref_runs,
                                     split_setup):
    """Full-chain parity with one hand genuinely undetected (round-5
    item): per-slot flags, the idx-0 fallback params through
    MANOWrapper, smoothing SKIPPED for the missing slot with its filter
    state preserved (main.py:69-83 — pinned by the detected ->
    missing -> detected frame order), and the reorganize_results
    filtering. The one reference fallback path previously covered only
    at parser level with stub nets."""
    from tools.convert_checkpoint import convert_state_dict, \
        enumerate_flax_paths
    from acr_tpu.pipeline.preprocess import img_preprocess
    from acr_tpu.pipeline.temporal import init_two_hand_filter

    utils, model = ref_env["utils"], ref_env["model"]
    parser = model._result_parser.centermap_parser
    old_thresh, parser.conf_thresh = parser.conf_thresh, 0.5
    biases = [model.l_final_layers[2][-1].bias,
              model.r_final_layers[2][-1].bias]
    seq = [frames[i] for i in split_setup["frame_order"]]
    try:
        for b, s in zip(biases, split_setup["shifts"]):
            b.data += s
        filters = {0: utils.create_OneEuroFilter(SMOOTH),
                   1: utils.create_OneEuroFilter(SMOOTH)}
        ref_out = [ref_chain(ref_env, filters, bgr, path,
                             require_detection=False)
                   for bgr, path in seq]
        # .copy(): detach().numpy() VIEWS the live torch storage, and the
        # finally-block un-shift below would silently revert the
        # converted weights before our app ever runs
        ref_sd = {k: v.detach().numpy().copy()
                  for k, v in model.state_dict().items()}
        flat, _, missing = convert_state_dict(ref_sd, enumerate_flax_paths())
        assert not missing
    finally:
        for b, s in zip(biases, split_setup["shifts"]):
            b.data -= s
        parser.conf_thresh = old_thresh

    app = _build_app({"npz_dir": converted["npz_dir"], "flat": flat}, 0.5)
    app.filter_state = init_two_hand_filter()
    for (bgr, path), (out_ref, ref_results), expected in zip(
            seq, ref_out, split_setup["expected"]):
        meta = img_preprocess(bgr, path, input_size=512)
        out = app.unpack_stream(app.stream_step(meta))
        ref_flags = [bool(f) for f in out_ref["detection_flag_cache"]]
        assert ref_flags == expected, path   # the designed scenario occurs
        got_flags = np.asarray(out["detection_flag"][0]).tolist()
        assert got_flags == ref_flags, path

        # whole-slot parity INCLUDING the undetected slot's idx-0
        # fallback params after wrapper + (skipped) smoothing
        pd = out_ref["params_dict"]
        for key, want in {
            "poses": pd["poses"].numpy(),
            "betas": pd["betas"].numpy(),
            "cam": pd["cam"].numpy(),
            "verts": _ref_stack(out_ref, "verts"),
            "pj2d_org": _ref_stack(out_ref, "pj2d_org"),
            "cam_trans": _ref_stack(out_ref, "cam_trans"),
        }.items():
            got = np.asarray(out[key][0], np.float64)
            err = np.abs(got - np.asarray(want, np.float64)).max()
            assert err < TOLS[key], f"{path}/{key}: {err:.2e}"

        # results-dict filtering: only detected hands appear, left
        # before right, with their own values
        ours = reorganize_like_app(app, out, path)
        assert set(ours) == set(ref_results) == {path}
        ref_hands, our_hands = ref_results[path], ours[path]
        assert len(our_hands) == len(ref_hands) == sum(ref_flags)
        for got, want in zip(our_hands, ref_hands):
            assert int(got["hand_type"]) == int(want["hand_type"]), path
            for key in ("verts", "cam_trans", "pj2d_org", "poses"):
                g = np.asarray(got[key], np.float64)
                w = np.asarray(want[key], np.float64)
                ulp = float(np.spacing(np.float16(np.abs(w).max())))
                assert np.abs(g - w).max() < TOLS[key] + 2 * ulp, \
                    f"{path}/{key}: {np.abs(g - w).max():.2e}"
            if sum(ref_flags) == 2:
                assert bool(got["detection_flag_cache"]) == \
                    bool(want["detection_flag_cache"])
            else:
                # Reference quirk NOT replicated: reorganize_results
                # filters every value array by `detected` but indexes
                # the UNfiltered flag array with the POST-filter
                # position (acr/utils.py:1228,1254), so the single
                # surviving hand is always reported under slot 0's
                # (left's) flag, whichever hand survived. Ours reports
                # the hand's own flag.
                assert bool(got["detection_flag_cache"]) is True
                assert bool(want["detection_flag_cache"]) is ref_flags[0]


def reorganize_like_app(app, out, path):
    """The app's reorganize tail on an unpacked stream-step output
    (process_frame's post-readback path, pipeline/results.py)."""
    from acr_tpu.pipeline.results import reorganize_results
    return reorganize_results(out, [path])
