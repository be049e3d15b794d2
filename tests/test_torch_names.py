"""Every flax parameter of the full model must map to a torch checkpoint key."""

import jax
import jax.numpy as jnp
import pytest

from acr_tpu.io.torch_names import map_flax_path


@pytest.fixture(scope="module")
def flax_paths():
    from acr_tpu.models.acr import ACRNet
    net = ACRNet()
    shapes = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 512, 512, 3), jnp.uint8)))
    paths = []

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + (k,), v)
        else:
            paths.append((prefix, node.shape))

    rec((), shapes["params"])
    return paths


def test_all_paths_map(flax_paths):
    for path, _ in flax_paths:
        base, kind = map_flax_path(path)  # raises KeyError on a gap
        assert kind in ("conv_kernel", "conv_bias", "bn", "dense_kernel",
                        "dense_bias", "lc_weight")


def test_bn_pairs_share_base(flax_paths):
    bn_bases = {}
    for path, _ in flax_paths:
        base, kind = map_flax_path(path)
        if kind == "bn":
            bn_bases.setdefault(base, set()).add(path[-1])
    assert bn_bases, "no BN params found"
    for base, leaves in bn_bases.items():
        assert leaves == {"scale", "bias"}, (base, leaves)


def test_mapping_is_injective(flax_paths):
    seen = {}
    for path, _ in flax_paths:
        base, kind = map_flax_path(path)
        key = (base, kind, path[-1] if kind == "bn" else None)
        assert key not in seen, f"{path} and {seen[key]} both map to {key}"
        seen[key] = path


def test_expected_torch_key_spotchecks(flax_paths):
    lookup = {p: map_flax_path(p) for p, _ in flax_paths}
    # stem
    assert lookup[("backbone", "stem1", "conv", "kernel")] == ("backbone.conv1", "conv_kernel")
    assert lookup[("backbone", "stem2", "bn", "scale")] == ("backbone.bn2", "bn")
    # layer1 bottleneck with downsample
    assert lookup[("backbone", "layer1_0", "down_conv", "kernel")] == \
        ("backbone.layer1.0.downsample.0", "conv_kernel")
    # transitions
    assert lookup[("backbone", "transition1_0", "conv", "kernel")] == \
        ("backbone.transition1.0.0", "conv_kernel")
    assert lookup[("backbone", "transition1_1_0", "conv", "kernel")] == \
        ("backbone.transition1.1.0.0", "conv_kernel")
    assert lookup[("backbone", "transition3_3_0", "bn", "bias")] == \
        ("backbone.transition3.3.0.1", "bn")
    # stage fuse layers: coarse->fine (j>i) and fine->coarse chain (j<i)
    assert lookup[("backbone", "stage3_2", "fuse_0_2", "conv", "kernel")] == \
        ("backbone.stage3.2.fuse_layers.0.2.0", "conv_kernel")
    assert lookup[("backbone", "stage4_0", "fuse_3_0_1", "bn", "scale")] == \
        ("backbone.stage4.0.fuse_layers.3.0.1.1", "bn")
    # branches
    assert lookup[("backbone", "stage2_0", "b1_3", "conv2", "kernel")] == \
        ("backbone.stage2.0.branches.1.3.conv2", "conv_kernel")
    # segm head
    assert lookup[("segm", "up1", "conv", "kernel")] == \
        ("backbone.hand_segm.segm_head.upsampler.up1.conv.double_conv.0", "conv_kernel")
    assert lookup[("segm", "out_conv2", "bias")] == \
        ("backbone.hand_segm.segm_head.segm_net.double_conv.3", "conv_bias")
    # global heads (ModuleList indices 1..4, reference: acr/model.py:185-202)
    assert lookup[("l_params_head", "trans", "conv", "kernel")] == \
        ("l_final_layers.1.0.0", "conv_kernel")
    assert lookup[("r_center_head", "blk1", "bn2", "scale")] == \
        ("r_final_layers.2.1.1.0.bn2", "bn")
    assert lookup[("l_cam_head", "out", "kernel")] == ("l_final_layers.3.2", "conv_kernel")
    assert lookup[("r_prior_head", "out", "bias")] == ("r_final_layers.4.2", "conv_bias")
    # part module (left=2/4, right=3/5, reference: acr/model.py:150-164)
    assert lookup[("l_pose_lc", "w")] == ("contact_layers.2", "lc_weight")
    assert lookup[("r_pose_lc", "w")] == ("contact_layers.3", "lc_weight")
    assert lookup[("l_shape_fc", "kernel")] == ("cam_shape_layers.2", "dense_kernel")
    assert lookup[("r_fuse_conv", "kernel")] == ("contact_layers.5", "conv_kernel")
    assert lookup[("contact_conv", "bn", "bias")] == ("contact_layers.1.1", "bn")
