"""Part-module fusion modes (`offset_mode`).

The reference names three modes but its forward only implements
'concat' (acr/model.py:158-164; the extra fuse convs exist only under
that mode, acr/model.py:254-258). Here all three are real:

* 'replace' — the non-cam channels become the broadcast pooled
  106-vector, so they must be spatially constant;
* 'offset'  — they are global-map channels PLUS that constant, so
  offset minus replace recovers the (spatially varying) global map;
* 'concat'  — the 1x1 fuse conv of the reference demo.

'offset'/'replace' nets share a parameter tree (no fuse conv), which
the tests exploit by applying the same params under both modes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acr_tpu.models.acr import ACRNet


@pytest.fixture(scope="module")
def setup():
    net_off = ACRNet(offset_mode="offset")
    img = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    params = net_off.init(jax.random.PRNGKey(0), img)
    img = (jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255
           ).astype(jnp.uint8)
    out_off = net_off.apply(params, img)
    out_rep = ACRNet(offset_mode="replace").apply(params, img)
    return params, img, out_off, out_rep


def test_replace_is_spatially_constant(setup):
    _, _, _, out_rep = setup
    for side in ("l", "r"):
        maps = np.asarray(out_rep[f"{side}_params_maps"])
        body = maps[..., 3:]
        np.testing.assert_array_equal(
            body, np.broadcast_to(body[:, :1, :1, :], body.shape))


def test_offset_minus_replace_is_global_map(setup):
    _, _, out_off, out_rep = setup
    for side in ("l", "r"):
        diff = (np.asarray(out_off[f"{side}_params_maps"])[..., 3:]
                - np.asarray(out_rep[f"{side}_params_maps"])[..., 3:])
        # the recovered global map varies spatially (it's a conv output)
        assert np.abs(diff - diff[:, :1, :1, :]).max() > 1e-4


def test_cam_channels_untouched_by_mode(setup):
    _, _, out_off, out_rep = setup
    for side in ("l", "r"):
        np.testing.assert_array_equal(
            np.asarray(out_off[f"{side}_params_maps"])[..., :3],
            np.asarray(out_rep[f"{side}_params_maps"])[..., :3])


def test_offset_replace_have_no_fuse_conv_params(setup):
    params, _, _, _ = setup
    names = str(jax.tree_util.tree_structure(params))
    assert "fuse_conv" not in names


def test_concat_mode_has_fuse_conv():
    net = ACRNet(offset_mode="concat")
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))
    names = str(jax.tree_util.tree_structure(params))
    assert "l_fuse_conv" in names and "r_fuse_conv" in names
