"""render_size=2048 path: 4x upscale paste-back (reference: visualization.py:206-216)."""

import numpy as np
import pytest

from acr_tpu.config import Config
from acr_tpu.viz.visualizer import Visualizer


def test_paste_back_4x(rng):
    faces = rng.randint(0, 778, (2, 1538, 3)).astype(np.int32)
    viz = Visualizer(Config(render_size=2048), faces)
    frame = (rng.rand(100, 60, 3) * 255).astype(np.uint8)
    offsets = np.array([100, 100, 0, 0, 0, 0, 0, 20, 0, 20], np.float32)
    rendered = np.full((2048, 2048, 3), 50, np.uint8)
    out = viz.paste_back(rendered, frame, offsets)
    # 4x path: output is the 4x-upscaled original with the render inside
    assert out.shape == (400, 240, 3)
    assert (np.abs(out[200, 120].astype(int) - 50) <= 2).all()


def test_composite_resizes_input(rng):
    faces = rng.randint(0, 778, (2, 1538, 3)).astype(np.int32)
    viz = Visualizer(Config(render_size=256), faces)
    rgba = np.zeros((256, 256, 4), np.float32)
    inp = (rng.rand(128, 128, 3) * 255).astype(np.uint8)   # needs resize
    out = viz.composite(rgba, inp)
    assert out.shape == (256, 256, 3)
