"""FULL-MODEL activation parity against the actual reference network.

Builds the reference torch model from /root/reference (runtime study —
no code copied), converts its randomly-initialized state_dict with our
checkpoint converter, loads it into the flax ACRNet, and compares every
output map of a 512px forward pass. Passing means ANY checkpoint for
the reference architecture converts correctly — the strongest parity
statement available without the license-gated weights.

Skipped when the reference tree is absent. Slow (~minutes, CPU).
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree unavailable")


@pytest.fixture(scope="module")
def ref_model():
    # stub native-backed deps the reference imports at module scope;
    # remember what we inject so teardown can remove the fakes (other
    # tests import h5py/chumpy for real and must not see empty stubs)
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
        aug.compute_paddings_to_reach_aspect_ratio = lambda *a, **k: (0, 0, 0, 0)
    if hasattr(sys.modules["imgaug"], "augmenters") is False:
        sys.modules["imgaug"].augmenters = aug

    argv_backup = sys.argv
    sys.argv = ["prog"]
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        import torch
        torch.manual_seed(0)
        from acr.model import ACR as RefACR
        model = RefACR().eval()
    finally:
        sys.argv = argv_backup
    yield model
    for name in injected:
        sys.modules.pop(name, None)


def test_every_converter_key_exists_in_reference(ref_model):
    from acr_tpu.io.torch_names import map_flax_path
    from tools.convert_checkpoint import enumerate_flax_paths

    ref_keys = set(ref_model.state_dict().keys())
    suffixes = {
        "conv_kernel": [".weight"], "conv_bias": [".bias"],
        "dense_kernel": [".weight"], "dense_bias": [".bias"],
        "lc_weight": [".weight"],
        "bn": [".weight", ".bias", ".running_mean", ".running_var"],
    }
    for path in enumerate_flax_paths():
        base, kind = map_flax_path(tuple(path))
        for suf in suffixes[kind]:
            assert base + suf in ref_keys, f"{path} -> {base + suf}"


def test_full_model_activation_parity(ref_model, rng):
    import torch
    from tools.convert_checkpoint import convert_state_dict, enumerate_flax_paths
    from acr_tpu.io.params import unflatten_params
    from acr_tpu.models.acr import ACRNet
    import jax.numpy as jnp

    ref_sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    paths = enumerate_flax_paths()
    flat, used, missing = convert_state_dict(ref_sd, paths)
    assert not missing
    params = unflatten_params(flat)

    img = (rng.rand(1, 512, 512, 3) * 255).astype(np.uint8)
    with torch.no_grad():
        feats = ref_model.backbone(torch.from_numpy(img))
        ref_out = ref_model.head_forward(feats)

    ours = ACRNet().apply(params, jnp.asarray(img))

    def to_nhwc(t):
        return t.detach().numpy().transpose(0, 2, 3, 1)

    for key, tol in (("l_params_maps", 2e-3), ("r_params_maps", 2e-3),
                     ("l_center_map", 2e-3), ("r_center_map", 2e-3),
                     ("l_prior_maps", 2e-3), ("r_prior_maps", 2e-3),
                     ("segms", 2e-3)):
        want = to_nhwc(ref_out[key])
        got = np.asarray(ours[key])
        assert got.shape == want.shape, key
        scale = max(1.0, np.abs(want).max())
        err = np.abs(got - want).max() / scale
        assert err < tol, f"{key}: rel err {err:.2e} (max |ref| {np.abs(want).max():.3f})"


def test_parser_parity_on_identical_maps(ref_model, rng):
    """Feed IDENTICAL maps through the reference ResultParser and our
    parse_outputs; sampled params, decoded poses, and flags must match.
    The reference parser hard-codes .cuda() (acr/result_parser.py:36,
    108-120,167-179); those are patched to no-ops for CPU execution."""
    import torch
    import jax.numpy as jnp
    from acr_tpu.parser.parse import parse_outputs

    # synthetic maps with two clear detections
    maps = {}
    size = 64
    for side in "lr":
        cm = np.zeros((1, 1, size, size), np.float32)
        y, x = (20, 24) if side == "l" else (22, 28)
        cm[0, 0, y, x] = 0.9
        maps[f"{side}_center_map"] = cm
        maps[f"{side}_params_maps"] = rng.randn(1, 109, size, size).astype(np.float32)
        maps[f"{side}_prior_maps"] = rng.randn(1, 106, size, size).astype(np.float32)

    # ---- reference parser (cuda patched out) ----
    cuda_backup = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        outputs = {k: torch.from_numpy(v) for k, v in maps.items()}
        meta = {"batch_ids": torch.arange(1)}
        ref_out, _ = ref_model._result_parser.parse(outputs, meta, {})
    finally:
        torch.Tensor.cuda = cuda_backup

    # ---- ours, NHWC ----
    ours = parse_outputs(
        {k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in maps.items()})

    ref_params = ref_out["params_pred"].numpy()        # (2, 109) [l, r]
    got_params = np.asarray(ours.params[0])            # (2, 109) [l, r]
    np.testing.assert_allclose(got_params, ref_params, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.poses[0]),
                               ref_out["params_dict"]["poses"].numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.betas[0]),
                               ref_out["params_dict"]["betas"].numpy(),
                               atol=1e-5)
    assert np.asarray(ours.detection_flag[0]).tolist() == \
        ref_out["detection_flag"].numpy().astype(bool).tolist()
    # centers: reference emits (x, y) map coords per hand
    np.testing.assert_allclose(np.asarray(ours.centers[0, 0]),
                               ref_out["l_centers_pred"].numpy()[0], atol=0)
    np.testing.assert_allclose(np.asarray(ours.centers[0, 1]),
                               ref_out["r_centers_pred"].numpy()[0], atol=0)


def test_projection_parity_vs_reference_utils(ref_model, rng):
    """Weak-persp projection, original-image mapping, and the WLS
    translation solve vs the reference's own implementations."""
    import torch
    import jax.numpy as jnp
    from acr.utils import (batch_orth_proj, convert_kp2d_from_input_to_orgimg,
                           estimate_translation_np)
    from acr_tpu.pipeline.project import (
        estimate_translation_ls, kp2d_to_org_image, weak_persp_project)

    pts = rng.randn(2, 21, 3).astype(np.float32)
    cam = rng.randn(2, 3).astype(np.float32)
    want = batch_orth_proj(torch.from_numpy(pts), torch.from_numpy(cam)).numpy()
    got = np.asarray(weak_persp_project(jnp.asarray(pts), jnp.asarray(cam)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    offsets = np.array([[300, 300, 0, 0, 0, 0, 10, 0, 30, 0]], np.float32)
    kp = rng.rand(1, 21, 2).astype(np.float32) * 2 - 1
    want2 = convert_kp2d_from_input_to_orgimg(
        torch.from_numpy(kp), torch.from_numpy(offsets)).numpy()
    got2 = np.asarray(kp2d_to_org_image(jnp.asarray(kp), jnp.asarray(offsets)))
    np.testing.assert_allclose(got2, want2, atol=1e-5)

    # translation: exact pinhole correspondences, conf = 1 everywhere
    j3d = rng.randn(21, 3).astype(np.float64) * 0.08
    t = np.array([0.1, -0.15, 2.2])
    f = 1265.0
    p = j3d + t
    uv = np.stack([f * p[:, 0] / p[:, 2] + 256,
                   f * p[:, 1] / p[:, 2] + 256], 1)
    want3 = estimate_translation_np(j3d, uv, np.ones(21), focal_length=f,
                                    img_size=np.array([512, 512]))
    got3 = np.asarray(estimate_translation_ls(
        jnp.asarray(j3d[None].astype(np.float32)),
        jnp.asarray(uv[None].astype(np.float32)), focal=f))[0]
    np.testing.assert_allclose(got3, want3, atol=1e-2)
    np.testing.assert_allclose(got3, t, atol=1e-2)


def test_rotation_math_parity_vs_reference(ref_model, rng):
    """axis-angle->rotmat (incl. the +1e-8 guard), 6D->axis-angle, and
    rotmat->axis-angle vs the reference's own functions."""
    import sys, types
    import torch
    import jax.numpy as jnp
    if not hasattr(sys.modules.get("chumpy", None), "Ch"):
        sys.modules.setdefault("chumpy", types.ModuleType("chumpy")).Ch = object
    from mano.manolayer import batch_rodrigues as ref_rodrigues
    from acr.utils import rot6D_to_angular, rotation_matrix_to_angle_axis
    from acr_tpu.ops.rotations import (
        axis_angle_to_rotmat, rot6d_to_axis_angle, rotmat_to_axis_angle)

    aa = (rng.randn(32, 3) * 1.2).astype(np.float32)
    want = ref_rodrigues(torch.from_numpy(aa)).numpy().reshape(-1, 3, 3)
    got = np.asarray(axis_angle_to_rotmat(jnp.asarray(aa)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # near-zero guard must degrade identically
    tiny = (rng.randn(4, 3) * 1e-8).astype(np.float32)
    want_t = ref_rodrigues(torch.from_numpy(tiny)).numpy().reshape(-1, 3, 3)
    got_t = np.asarray(axis_angle_to_rotmat(jnp.asarray(tiny)))
    np.testing.assert_allclose(got_t, want_t, atol=1e-6)

    six = rng.randn(8, 15 * 6).astype(np.float32)
    want6 = rot6D_to_angular(torch.from_numpy(six)).numpy()
    got6 = np.asarray(rot6d_to_axis_angle(jnp.asarray(six)))
    np.testing.assert_allclose(got6, want6, atol=1e-4)

    mats = want[:8]
    want_aa = rotation_matrix_to_angle_axis(
        torch.from_numpy(mats)).numpy()
    got_aa = np.asarray(rotmat_to_axis_angle(jnp.asarray(mats)))
    np.testing.assert_allclose(got_aa, want_aa, atol=1e-4)


def test_mano_layer_parity_vs_reference(ref_model, rng, tmp_path):
    """Reference torch ManoLayer vs our mano_forward on IDENTICAL
    synthetic assets (a functional chumpy stub powers the reference's
    pkl loader: .r arrays, dot, MatVecMult, vstack)."""
    import pickle
    import sys, types
    import torch
    import jax.numpy as jnp

    # ---- minimal functional chumpy ----
    class _ChArray(np.ndarray):
        dterms = ("x",)

        @property
        def r(self):
            return np.asarray(self)

        def dot(self, other):
            return np.asarray(self) @ np.asarray(other)

    def _as_ch(a):
        return np.asarray(a, np.float64).view(_ChArray)

    ch = types.ModuleType("chumpy")
    ch.Ch = object
    ch.array = _as_ch
    ch.eye = lambda n: _as_ch(np.eye(n))
    ch.vstack = lambda arrs: _as_ch(np.vstack([np.asarray(a) for a in arrs]))
    ch.concatenate = lambda arrs: _as_ch(np.concatenate(
        [np.asarray(a) for a in arrs]))
    ch_ch = types.ModuleType("chumpy.ch")
    ch_ch.MatVecMult = lambda m, v: _as_ch(
        np.asarray(m.todense() if hasattr(m, "todense") else m) @ np.asarray(v))
    ch.ch = ch_ch
    modules_backup = {name: sys.modules.get(name)
                      for name in ("chumpy", "chumpy.ch", "mano",
                                   "mano.manolayer")}
    sys.modules["chumpy"] = ch
    sys.modules["chumpy.ch"] = ch_ch

    try:
        # reload manolayer under the functional stub
        for mod in list(sys.modules):
            if mod == "mano.manolayer" or mod == "mano":
                del sys.modules[mod]
        import cv2
        import mano.manolayer as ref_manolayer
        # the reference's numpy lrotmin path references cv2 without
        # importing it (mano/manolayer.py:336) — reachable only under
        # our stub
        ref_manolayer.cv2 = cv2
        RefManoLayer = ref_manolayer.ManoLayer

        # synthetic assets shared by both implementations
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.make_synthetic_mano import make_assets
        from tests.test_mano import _model_from_assets
        from acr_tpu.models.mano import mano_forward

        assets = make_assets("right", seed=0)
        # download-format pkl construction shared with the ingestion
        # test (tests/test_ingest.py)
        from tests.test_ingest import make_chumpy_style_pkl
        pkl = make_chumpy_style_pkl(assets)
        mano_dir = tmp_path / "mano"
        mano_dir.mkdir()
        with open(mano_dir / "MANO_RIGHT.pkl", "wb") as f:
            pickle.dump(pkl, f)

        ref_layer = RefManoLayer(center_idx=9, flat_hand_mean=False,
                                 ncomps=45, side="right",
                                 mano_root=str(mano_dir), use_pca=False)
        ours = _model_from_assets(assets, "right")

        poses = (rng.randn(3, 48) * 0.5).astype(np.float32)
        betas = (rng.randn(3, 10) * 0.8).astype(np.float32)
        with torch.no_grad():
            want_v, want_j, _ = ref_layer(torch.from_numpy(poses),
                                          th_betas=torch.from_numpy(betas))
        got_v, got_j, _ = mano_forward(ours, jnp.asarray(poses),
                                       jnp.asarray(betas))
        np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_j), want_j.numpy(), atol=2e-5)
    finally:
        # restore the real modules (or remove our stubs) so later tests
        # importing chumpy / mano.manolayer see the genuine state
        for name, mod in modules_backup.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod


def test_oneeuro_parity_vs_reference(ref_model, rng):
    """Functional OneEuro vs the reference's stateful filter classes,
    driven the way the reference APP drives them: the smoothed values
    are assigned back into the same tensor row the filter stored as its
    ``prev_raw_value`` view (acr/main.py:78-83), so from the third
    frame on the articulation/betas derivative is taken against the
    previous OUTPUT (the aliasing our ``dx_from_output=True`` channels
    reproduce — pipeline/temporal.py module docstring). The orient
    filter stores a fresh matrix and stays textbook."""
    import torch
    import jax.numpy as jnp
    from acr.utils import create_OneEuroFilter, smooth_results
    from acr_tpu.pipeline.temporal import init_hand_filter, smooth_hand

    filters = create_OneEuroFilter(4.0)
    state = init_hand_filter()
    detected = jnp.asarray(True)
    for step in range(6):
        poses = (rng.randn(48) * 0.3).astype(np.float32)
        betas = (rng.randn(10) * 0.5).astype(np.float32)
        # app-style: one shared storage per frame, smoothed row assigned
        # back (poses_t[0] is the view smooth_results' filters capture)
        poses_t = torch.from_numpy(poses.copy())[None]
        betas_t = torch.from_numpy(betas.copy())[None]
        poses_t[0], betas_t[0] = smooth_results(filters, poses_t[0],
                                                betas_t[0])
        want_p, want_b = poses_t[0], betas_t[0]
        state, got_p, got_b = smooth_hand(state, jnp.asarray(poses),
                                          jnp.asarray(betas), detected, 4.0)
        np.testing.assert_allclose(np.asarray(got_b), want_b.numpy(),
                                   atol=1e-5, err_msg=f"betas step {step}")
        np.testing.assert_allclose(np.asarray(got_p)[3:], want_p.numpy()[3:],
                                   atol=1e-5, err_msg=f"pose step {step}")
        np.testing.assert_allclose(np.asarray(got_p)[:3], want_p.numpy()[:3],
                                   atol=1e-4, err_msg=f"orient step {step}")
