"""Layer-level numerical parity: converted torch weights -> flax modules.

Validates every conversion kind (conv OIHW->HWIO, stride-2 padding
semantics, folded BatchNorm, Linear transpose, LocallyConnected
reshape) and every resampling op against torch eval-mode behaviour.
This is the layer-by-layer leg of the parity harness (SURVEY.md §4);
whole-model parity needs the license-gated checkpoint.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from acr_tpu.models.layers import (
    BasicBlock,
    Bottleneck,
    ConvBN,
    downsample_nearest_half,
    get_coord_maps,
    resize_bilinear_align_corners,
    upsample_nearest,
)

torch.manual_seed(0)


def to_jax_conv(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def fold_bn(bn):
    scale = bn.weight.detach().numpy() / np.sqrt(bn.running_var.detach().numpy() + bn.eps)
    bias = bn.bias.detach().numpy() - bn.running_mean.detach().numpy() * scale
    return jnp.asarray(scale), jnp.asarray(bias)


def rand_bn(ch):
    bn = torch.nn.BatchNorm2d(ch).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.rand(ch) + 0.5)
        bn.bias.copy_(torch.randn(ch))
        bn.running_mean.copy_(torch.randn(ch))
        bn.running_var.copy_(torch.rand(ch) + 0.2)
    return bn


def nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("stride,kernel,pad,height", [(1, 3, 1, 8), (2, 3, 1, 8),
                                                      (1, 1, 0, 8), (2, 1, 0, 8),
                                                      (2, 3, 1, 9)])
def test_conv_padding_semantics(rng, stride, kernel, pad, height):
    x = rng.randn(2, height, height, 5).astype(np.float32)
    tconv = torch.nn.Conv2d(5, 7, kernel, stride, pad, bias=True)
    want = nhwc(tconv(nchw(x)))

    from acr_tpu.models.layers import conv
    mod = conv(7, kernel, stride, pad=pad, use_bias=True)
    variables = {"params": {"kernel": to_jax_conv(tconv.weight),
                            "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_bn_relu_block(rng):
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, 2, 1, bias=False)
    tbn = rand_bn(6)
    want = nhwc(F.relu(tbn(tconv(nchw(x)))))

    scale, bias = fold_bn(tbn)
    variables = {"params": {"conv": {"kernel": to_jax_conv(tconv.weight)},
                            "bn": {"scale": scale, "bias": bias}}}
    got = np.asarray(ConvBN(6, 3, 2).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


class TorchBasicBlock(torch.nn.Module):
    """Torch twin of the reference BasicBlock for parity fixtures."""

    def __init__(self, ch):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn1 = rand_bn(ch)
        self.conv2 = torch.nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = rand_bn(ch)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + x)


def test_basic_block_parity(rng):
    ch = 6
    x = rng.randn(1, 8, 8, ch).astype(np.float32)
    tb = TorchBasicBlock(ch).eval()
    want = nhwc(tb(nchw(x)))

    s1, b1 = fold_bn(tb.bn1)
    s2, b2 = fold_bn(tb.bn2)
    variables = {"params": {
        "conv1": {"kernel": to_jax_conv(tb.conv1.weight)},
        "bn1": {"scale": s1, "bias": b1},
        "conv2": {"kernel": to_jax_conv(tb.conv2.weight)},
        "bn2": {"scale": s2, "bias": b2},
    }}
    got = np.asarray(BasicBlock(ch).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_linear_parity(rng):
    x = rng.randn(3, 12).astype(np.float32)
    lin = torch.nn.Linear(12, 5)
    want = lin(torch.from_numpy(x)).detach().numpy()
    import flax.linen as nn
    variables = {"params": {
        "kernel": jnp.asarray(lin.weight.detach().numpy().T),
        "bias": jnp.asarray(lin.bias.detach().numpy())}}
    got = np.asarray(nn.Dense(5).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_locally_connected_parity(rng):
    # torch weight (1, O, C, J, 1, 1); reference forward unfolds then
    # sums over (C, k^2) (acr/model.py:559-569)
    B, C, J, O = 2, 10, 16, 6
    x = rng.randn(B, C, J, 1).astype(np.float32)
    w = rng.randn(1, O, C, J, 1, 1).astype(np.float32)
    tx = torch.from_numpy(x)
    tw = torch.from_numpy(w)
    unf = tx.unfold(2, 1, 1).unfold(3, 1, 1)
    unf = unf.contiguous().view(*unf.size()[:-2], -1)
    want = (unf.unsqueeze(1) * tw).sum([2, -1]).numpy()      # (B, O, J, 1)

    from acr_tpu.models.acr import LocallyConnected
    variables = {"params": {"w": jnp.asarray(w.reshape(O, C, J))}}
    # x is (B, J, C) in the TPU lane-dense layout (C minor)
    got = np.asarray(LocallyConnected(O, C, J).apply(
        variables, jnp.asarray(x[..., 0].transpose(0, 2, 1))))  # (B, O, J)
    np.testing.assert_allclose(got, want[..., 0], atol=1e-5)


def test_bilinear_align_corners_upsample(rng):
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    want = nhwc(F.interpolate(nchw(x), scale_factor=2, mode="bilinear",
                              align_corners=True))
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (14, 18)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_upsample(rng):
    x = rng.randn(1, 4, 4, 2).astype(np.float32)
    for k in (2, 4):
        want = nhwc(F.interpolate(nchw(x), scale_factor=k, mode="nearest"))
        got = np.asarray(upsample_nearest(jnp.asarray(x), k))
        np.testing.assert_allclose(got, want, atol=0)


def test_nearest_downsample_half(rng):
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    want = nhwc(F.interpolate(nchw(x), scale_factor=0.5, mode="nearest"))
    got = np.asarray(downsample_nearest_half(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=0)


def test_coord_maps_match_reference_semantics():
    # channel 0: x (varies along width), channel 1: y; both in [-1, 1]
    cm = np.asarray(get_coord_maps(4))
    assert cm.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(cm[0, 0, :, 0], np.array([-1, -1/3, 1/3, 1]), atol=1e-6)
    np.testing.assert_allclose(cm[0, :, 0, 1], np.array([-1, -1/3, 1/3, 1]), atol=1e-6)
    np.testing.assert_allclose(cm[0, :, 2, 0], np.full(4, 1/3), atol=1e-6)


def test_hadamard_pool_matches_torch(rng):
    from acr_tpu.models.acr import hadamard_pool
    B, H, W, C, J = 2, 6, 6, 5, 4
    feats = rng.randn(B, H, W, C).astype(np.float32)
    att = rng.randn(B, H, W, J).astype(np.float32)
    # reference semantics (acr/model.py:103-113), NCHW
    tfe = nchw(feats).reshape(B, C, H * W)
    tat = torch.softmax(nchw(att).reshape(B, J, H * W), dim=-1)
    want = torch.matmul(tat, tfe.transpose(2, 1)).numpy()    # (B, J, C)
    # hadamard_pool emits (B, J, C) — the reference's (B, C, J)
    # transposed so C stays on the TPU lane dim
    got = np.asarray(hadamard_pool(jnp.asarray(feats), jnp.asarray(att)))
    np.testing.assert_allclose(got, want, atol=1e-5)
