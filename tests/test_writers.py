"""IO writer tests: obj round trip, json/yaml, video encode, split_frame."""

import os

import numpy as np
import pytest

from acr_tpu.io.writers import (
    collect_image_list,
    load_obj,
    save_json,
    save_obj,
    save_video,
    save_yaml,
    split_frame,
)


def test_obj_round_trip(tmp_path, rng):
    verts = rng.randn(50, 3).astype(np.float32)
    faces = rng.randint(0, 50, (30, 3)).astype(np.int32)
    p = str(tmp_path / "hand.obj")
    save_obj(p, verts, faces)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_json_yaml(tmp_path, rng):
    obj = {"a": 1, "arr": rng.randn(3).astype(np.float32)}
    import json
    save_json(str(tmp_path / "x.json"), obj)
    data = json.load(open(tmp_path / "x.json"))
    assert data["a"] == 1 and len(data["arr"]) == 3
    import yaml
    save_yaml(str(tmp_path / "x.yaml"), {"b": [1, 2]})
    assert yaml.safe_load(open(tmp_path / "x.yaml")) == {"b": [1, 2]}


def test_video_round_trip(tmp_path, rng):
    import cv2
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(4):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    out = save_video(str(d), str(tmp_path / "clip"))
    assert os.path.exists(out)
    # split it back to frames
    frames_dir = split_frame(out, out_dir=str(tmp_path / "resplit"))
    assert len(collect_image_list(frames_dir)) == 4
