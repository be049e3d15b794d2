"""Aux subsystem tests: meters, stage timer, config session, video scan."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from acr_tpu.config import Config
from acr_tpu.pipeline.temporal import (
    init_two_hand_filter,
    smooth_sequence,
    smooth_two_hands,
)
from acr_tpu.utils.meters import AverageMeter, AverageMeterDict, StageTimer
from acr_tpu.utils.session import ConfigSession


def test_average_meter():
    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0 and m.count == 3 and m.val == 3.0
    m.update(10.0, n=2)
    assert m.count == 5 and abs(m.avg - (6 + 20) / 5) < 1e-9


def test_average_meter_dict():
    d = AverageMeterDict()
    d.update({"a": 1.0, "b": 2.0})
    d.update({"a": 3.0})
    assert d.avg() == {"a": 2.0, "b": 2.0}


def test_stage_timer():
    t = StageTimer()
    with t.stage("x"):
        time.sleep(0.01)
    with t.stage("x"):
        time.sleep(0.01)
    rep = t.report()
    assert rep["x"]["count"] == 2
    assert rep["x"]["avg_ms"] >= 8.0


def test_config_session(tmp_path):
    cfg = Config(demo_mode="video")
    sess = ConfigSession(cfg, out_dir=str(tmp_path))
    with sess as c:
        assert os.path.exists(sess.path)
        import yaml
        data = yaml.safe_load(open(sess.path))
        assert data["demo_mode"] == "video"
        assert c is cfg
    assert not os.path.exists(sess.path)


def test_smooth_sequence_equals_stepwise(rng):
    poses = jnp.asarray(rng.randn(7, 2, 48).astype(np.float32) * 0.2)
    betas = jnp.asarray(rng.randn(7, 2, 10).astype(np.float32))
    det = jnp.asarray(rng.rand(7, 2) > 0.3)

    st1 = init_two_hand_filter()
    _, ps, bs = smooth_sequence(st1, poses, betas, det)

    st2 = init_two_hand_filter()
    for i in range(7):
        st2, p_i, b_i = smooth_two_hands(st2, poses[i], betas[i], det[i])
        np.testing.assert_allclose(np.asarray(ps[i]), np.asarray(p_i),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(bs[i]), np.asarray(b_i),
                                   atol=1e-5)
