"""One-command real-asset ingestion (tools/ingest_real_assets.py).

The real MANO pickles and wild.pkl are license-gated and absent here;
these tests exercise the FULL ingestion path on faithful synthetic
stand-ins: chumpy-format MANO pickles (the same construction the
reference-parity test drives the reference's own loader with) and a
torch-pickled reference-named state_dict with a DataParallel
``module.`` prefix.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_chumpy_style_pkl(assets: dict) -> dict:
    """MANO-download-format dict (float64, sparse J_regressor, raw key
    names) from synthetic assets — what the registered download
    contains (reference: mano/manolayer.py:350-394)."""
    import scipy.sparse as sp
    return {
        "v_template": assets["v_template"].astype(np.float64),
        "shapedirs": assets["shapedirs"].astype(np.float64),
        "posedirs": assets["posedirs"].astype(np.float64),
        "J_regressor": sp.csc_matrix(assets["J_regressor"].astype(np.float64)),
        "weights": assets["weights"].astype(np.float64),
        "f": assets["faces"].astype(np.uint32),
        "hands_mean": assets["hands_mean"].astype(np.float64),
        "hands_components": assets["hands_components"].astype(np.float64),
        "kintree_table": assets["kintree_table"],
        "bs_type": "lrotmin",
        "bs_style": "lbs",
    }


@pytest.fixture(scope="module")
def mano_pkl_dir(tmp_path_factory):
    """Directory with MANO_LEFT.pkl / MANO_RIGHT.pkl stand-ins.

    The pickles carry the RAW (unflipped) left shapedirs — the
    converter must bake in the reference's runtime x-flip
    (acr/mano_wrapper.py:35).
    """
    from tools.make_synthetic_mano import make_assets
    d = tmp_path_factory.mktemp("mano_pkls")
    for side, name in (("left", "MANO_LEFT.pkl"), ("right", "MANO_RIGHT.pkl")):
        assets = dict(make_assets(side, seed=0))
        if side == "left":
            # make_assets bakes the flip in; the download doesn't
            assets["shapedirs"] = assets["shapedirs"].copy()
            assets["shapedirs"][:, 0, :] *= -1
        with open(d / name, "wb") as f:
            pickle.dump(make_chumpy_style_pkl(assets), f)
    return str(d)


@pytest.fixture(scope="module")
def torch_ckpt_path(tmp_path_factory):
    """A torch-pickled state_dict with reference key names (inverse of
    our converter's layout mapping) and a 'module.' prefix."""
    import jax
    import jax.numpy as jnp
    import torch
    from acr_tpu.io.torch_names import map_flax_path
    from acr_tpu.models.acr import ACRNet
    from tools.convert_checkpoint import enumerate_flax_paths

    net = ACRNet()
    shapes = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3), jnp.uint8)))["params"]

    def get_shape(path):
        node = shapes
        for k in path:
            node = node[k]
        return tuple(node.shape)

    rng = np.random.RandomState(0)
    sd = {}
    for path in enumerate_flax_paths():
        base, kind = map_flax_path(tuple(path))
        shape = get_shape(path)
        if kind == "conv_kernel":      # flax (kh,kw,I,O) <- torch (O,I,kh,kw)
            sd[base + ".weight"] = rng.randn(
                shape[3], shape[2], shape[0], shape[1]) * 0.05
        elif kind == "conv_bias":
            sd[base + ".bias"] = rng.randn(*shape) * 0.05
        elif kind == "dense_kernel":   # flax (I,O) <- torch (O,I)
            sd[base + ".weight"] = rng.randn(shape[1], shape[0]) * 0.05
        elif kind == "dense_bias":
            sd[base + ".bias"] = rng.randn(*shape) * 0.05
        elif kind == "lc_weight":      # flax (O,C,J) <- torch (1,O,C,J,1,1)
            sd[base + ".weight"] = rng.randn(
                1, shape[0], shape[1], shape[2], 1, 1) * 0.05
        elif kind == "bn" and base + ".weight" not in sd:
            c = shape[0]
            sd[base + ".weight"] = rng.rand(c) * 0.3 + 0.1   # damped gamma
            sd[base + ".bias"] = rng.randn(c) * 0.05
            sd[base + ".running_mean"] = rng.randn(c) * 0.05
            sd[base + ".running_var"] = rng.rand(c) * 0.5 + 0.5
    # bias the center heads so the smoke actually detects hands
    for side in "lr":
        base, _ = map_flax_path((f"{side}_center_head", "out", "bias"))
        key = base + ".bias"
        assert key in sd, sorted(sd)[:5]
        sd[key] = sd[key] + 0.5
    sd = {"module." + k: torch.from_numpy(np.asarray(v, np.float32))
          for k, v in sd.items()}
    path = tmp_path_factory.mktemp("ckpt") / "wild.pkl"
    torch.save(sd, str(path))
    return str(path)


def test_ingest_end_to_end(tmp_path, mano_pkl_dir, torch_ckpt_path, rng,
                           capsys):
    """The single command converts both asset families, reports, and
    passes the golden smoke."""
    import cv2
    from tools.ingest_real_assets import main

    img_path = tmp_path / "photo.jpg"
    cv2.imwrite(str(img_path), (rng.rand(96, 128, 3) * 255).astype(np.uint8))
    out_mano = tmp_path / "mano_out"
    out_ckpt = tmp_path / "ckpt_out" / "wild.npz"
    rc = main(["--mano_dir", mano_pkl_dir,
               "--checkpoint", torch_ckpt_path,
               "--out_mano", str(out_mano),
               "--out_ckpt", str(out_ckpt),
               "--smoke_image", str(img_path),
               "--smoke_output", str(tmp_path / "smoke") + "/",
               "--smoke_input_size", "128"])
    assert rc == 0
    report = capsys.readouterr().out
    assert "converted" in report and "sha256" in report
    assert os.path.exists(out_mano / "mano_left.npz")
    assert os.path.exists(out_ckpt)
    assert os.path.exists(tmp_path / "smoke" / "photo.jpg")

    # left-hand shapedirs flip baked in at convert time
    with open(os.path.join(mano_pkl_dir, "MANO_LEFT.pkl"), "rb") as f:
        raw = pickle.load(f)
    conv = np.load(out_mano / "mano_left.npz")
    np.testing.assert_allclose(conv["shapedirs"][:, 0],
                               -np.asarray(raw["shapedirs"], np.float32)[:, 0],
                               atol=1e-6)
    np.testing.assert_allclose(conv["shapedirs"][:, 1:],
                               np.asarray(raw["shapedirs"], np.float32)[:, 1:],
                               atol=1e-6)

    # converted MANO npz loads through the runtime loader
    from acr_tpu.models.mano import load_mano_model, mano_forward
    import jax.numpy as jnp
    model, faces = load_mano_model(str(out_mano), "right")
    verts, joints, _ = mano_forward(
        model, jnp.zeros((1, 48)), jnp.zeros((1, 10)), center_idx=9)
    assert verts.shape == (1, 778, 3) and joints.shape == (1, 21, 3)
    np.testing.assert_allclose(np.asarray(joints[0, 9]), 0.0, atol=1e-6)


def test_ingest_missing_assets_fail_loudly(tmp_path, capsys):
    from tools.ingest_real_assets import main
    rc = main(["--mano_dir", str(tmp_path),
               "--checkpoint", str(tmp_path / "nope.pkl"),
               "--no_smoke"])
    assert rc == 1
    out = capsys.readouterr().out
    assert "ERROR" in out and "not found" in out


def test_ingest_rejects_incomplete_checkpoint(tmp_path, mano_pkl_dir,
                                              capsys):
    """A checkpoint missing network params fails (no silent partial
    load), unless --allow_missing."""
    import torch
    from tools.ingest_real_assets import main
    bad = tmp_path / "partial.pkl"
    torch.save({"backbone.conv1.weight":
                torch.zeros(64, 3, 3, 3)}, str(bad))
    rc = main(["--mano_dir", mano_pkl_dir, "--checkpoint", str(bad),
               "--out_mano", str(tmp_path / "m"),
               "--out_ckpt", str(tmp_path / "c.npz"), "--no_smoke"])
    assert rc == 1
    assert "MISSING" in capsys.readouterr().out
