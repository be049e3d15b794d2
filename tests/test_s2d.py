"""Space-to-depth HRNet rewrite: exactness at every level.

The s2d rewrite (models/s2d.py) is a pure performance transform — the
claim is bit-level equivalence up to float reassociation. These tests
pin it at the kernel-transform, module, backbone, and pipeline level,
plus the lane-padded segm convs (layers.LanePaddedConv).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.models.hrnet import HRModule, HRNetBackbone, STAGE3, SegmNet
from acr_tpu.models.layers import depth_to_space2, space_to_depth2
from acr_tpu.models.s2d import (
    s2d_conv3_weights,
    s2d_strided_conv3_weights,
    transform_params_s2d,
)


def _conv(x, w, stride=1, padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    np.testing.assert_array_equal(depth_to_space2(space_to_depth2(x)), x)


def test_s2d_conv3_weights_exact(rng):
    c, co = 3, 5
    x = jnp.asarray(rng.randn(2, 16, 12, c).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32))
    ref = _conv(x, w)
    macro = _conv(space_to_depth2(x), jnp.asarray(s2d_conv3_weights(np.asarray(w))))
    np.testing.assert_allclose(depth_to_space2(macro), ref, atol=1e-5)


def test_s2d_pack_out_conv3_weights_exact(rng):
    from acr_tpu.models.s2d import s2d_pack_out_conv3_weights
    c, co = 4, 3
    x = jnp.asarray(rng.randn(2, 16, 12, c).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32))
    ref = space_to_depth2(_conv(x, w))                # pack after conv
    macro = _conv(x, jnp.asarray(s2d_pack_out_conv3_weights(np.asarray(w))),
                  stride=2, padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(macro, ref, atol=1e-5)


def test_s2d_strided_conv3_weights_exact(rng):
    c, co = 3, 7
    x = jnp.asarray(rng.randn(2, 16, 12, c).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32))
    ref = _conv(x, w, stride=2)                       # torch pad=1, s2
    macro = _conv(space_to_depth2(x),
                  jnp.asarray(s2d_strided_conv3_weights(np.asarray(w))),
                  stride=1, padding=((1, 0), (1, 0)))
    np.testing.assert_allclose(macro, ref, atol=1e-5)


@pytest.fixture(scope="module")
def hrmodule_pair(rng):
    mod = HRModule(STAGE3["channels"])                # 3 branches
    xs = [jnp.asarray(rng.randn(2, 32, 32, 32).astype(np.float32) * 0.1),
          jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32) * 0.1),
          jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32) * 0.1)]
    params = mod.init(jax.random.PRNGKey(0), xs)
    return mod, xs, params


def test_hrmodule_s2d_exact(hrmodule_pair):
    mod, xs, params = hrmodule_pair
    ref = mod.apply(params, xs)
    mod_s = HRModule(STAGE3["channels"], s2d0=True)
    xs_s = [space_to_depth2(xs[0])] + xs[1:]
    out = mod_s.apply(transform_params_s2d({"params": params["params"]}), xs_s)
    np.testing.assert_allclose(depth_to_space2(out[0]), ref[0], atol=2e-4)
    for a, b in zip(out[1:], ref[1:]):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_hrmodule_s2d_transform_idempotent(hrmodule_pair):
    _, xs, params = hrmodule_pair
    once = transform_params_s2d({"params": params["params"]})
    twice = transform_params_s2d(once)
    chk = jax.tree.map(np.testing.assert_array_equal, once, twice)
    del chk


def test_backbone_s2d_exact(rng):
    bb = HRNetBackbone()
    img = (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    params = bb.init(jax.random.PRNGKey(1), jnp.asarray(img))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    ref = bb.apply(params, jnp.asarray(img))
    out = HRNetBackbone(s2d0=True).apply(
        transform_params_s2d(params), jnp.asarray(img))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_resize_bilinear_x2_s2d_exact(rng):
    from acr_tpu.models.layers import (
        resize_bilinear_align_corners, resize_bilinear_x2_s2d)
    x = jnp.asarray(rng.randn(2, 16, 12, 5).astype(np.float32))
    ref = space_to_depth2(resize_bilinear_align_corners(x, (32, 24)))
    np.testing.assert_allclose(resize_bilinear_x2_s2d(x), ref, atol=1e-6)


def _segm_s2d_params(params):
    t = transform_params_s2d({"params": {"segm": params["params"]}},
                             highres=False, segm=True)
    return {"params": t["params"]["segm"]}


def test_segm_s2d_exact(rng):
    from acr_tpu.models.layers import downsample_nearest_half
    x = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32) * 0.3)
    plain = SegmNet()
    params = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(params, x)                       # (1, 32, 32, 33)
    packed = SegmNet(s2d=True).apply(_segm_s2d_params(params), x)
    assert packed.shape == (1, 16, 16, 132)
    np.testing.assert_allclose(depth_to_space2(packed), ref,
                               atol=2e-4, rtol=1e-4)
    # phase (0,0) channels ARE the nearest 2x downsample (the part-
    # attention source) — exact by construction
    np.testing.assert_allclose(packed[..., :33],
                               downsample_nearest_half(ref),
                               atol=2e-4, rtol=1e-4)


def test_segm_s2d_transform_idempotent(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    params = SegmNet().init(jax.random.PRNGKey(0), x)
    once = transform_params_s2d({"params": {"segm": params["params"]}},
                                highres=False, segm=True)
    twice = transform_params_s2d(once, highres=False, segm=True)
    jax.tree.map(np.testing.assert_array_equal, once, twice)


def test_stem_s2d_exact(rng):
    """Packed-input stem1 (2x2 uint8 pack + strided macro conv) is exact."""
    img = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    bb = HRNetBackbone()
    params = bb.init(jax.random.PRNGKey(3), jnp.asarray(img))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    ref = bb.apply(params, jnp.asarray(img))
    out = HRNetBackbone(s2d_stem=True).apply(
        transform_params_s2d(params, highres=False, stem=True),
        jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_merged_heads_exact(rng):
    """One dense 512ch transition conv == 8 separate 64ch ones."""
    from acr_tpu.models.acr import ACRNet
    img = (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(4), jnp.asarray(img))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    ref = net.apply(params, jnp.asarray(img))
    merged = transform_params_s2d(params, highres=False, merged_heads=True)
    # per-head trans convs removed; one concatenated conv added
    assert "heads_trans" in merged["params"]
    assert "trans" not in merged["params"]["l_params_head"]
    out = ACRNet(merged_heads=True).apply(merged, jnp.asarray(img))
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)


def test_merged_heads_no_prior_exact(rng):
    """inter_prior=False + merged_heads: the transform must merge only
    the 6 heads the net builds (the checkpoint's prior heads stay
    untouched) — regression for a ScopeParamShapeError."""
    from acr_tpu.models.acr import ACRNet
    img = (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    net = ACRNet(inter_prior=False)
    params = net.init(jax.random.PRNGKey(5), jnp.asarray(img))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    ref = net.apply(params, jnp.asarray(img))
    merged = transform_params_s2d(params, highres=False, merged_heads=True,
                                  inter_prior=False)
    assert merged["params"]["heads_trans"]["conv"]["kernel"].shape[-1] == 384
    out = ACRNet(inter_prior=False, merged_heads=True).apply(
        merged, jnp.asarray(img))
    for k in ref:
        if ref[k] is None:
            continue
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-4, rtol=1e-4, err_msg=k)


def test_acrnet_s2d_full_exact(rng):
    """All four exact rewrites together, whole network, all output maps."""
    from acr_tpu.models.acr import ACRNet
    img = (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)
    net = ACRNet()
    params = net.init(jax.random.PRNGKey(2), jnp.asarray(img))
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x * 0.2 if getattr(p[-1], "key", None) == "scale" else x,
        params)
    ref = net.apply(params, jnp.asarray(img))
    out = ACRNet(s2d_highres=True, s2d_segm=True, s2d_stem=True,
                 merged_heads=True).apply(
        transform_params_s2d(params, highres=True, segm=True, stem=True,
                             merged_heads=True),
        jnp.asarray(img))
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-3, rtol=1e-3, err_msg=k)


def test_segm_lane_padding_exact_vs_plain(rng):
    # lane-padded evaluation keeps canonical param shapes and computes
    # exactly the plain 33-channel result
    x = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    plain = SegmNet()                         # default: lanes=None
    params = plain.init(jax.random.PRNGKey(0), x)
    padded = SegmNet(lanes=64)
    flat = jax.tree_util.tree_flatten_with_path(
        padded.init(jax.random.PRNGKey(0), x))[0]
    shapes = {"/".join(str(k.key) for k in p): v.shape for p, v in flat}
    assert shapes["params/out1/conv/kernel"] == (3, 3, 64, 33)
    assert shapes["params/out1/bn/scale"] == (33,)
    assert shapes["params/out_conv2/kernel"] == (3, 3, 33, 33)
    ref = plain.apply(params, x)
    out = padded.apply(params, x)             # same params, both paths
    assert out.shape == (1, 32, 32, 33)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
