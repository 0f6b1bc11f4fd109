"""Layer-library parity vs the reference models/blocks.py (torch-only module,
imported read-only) with transplanted weights — covers the shared primitives
every model family is built on."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

blocks = pytest.importorskip("models.blocks")

from vaeplay_tpu.core.layers import (  # noqa: E402
    AddCoords, ConvBlock, DenseBlock, Down, SCSEBlock, SelfAttentionBlock, Up,
)


def t2j_conv(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def t2j_lin(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (1, 0)))


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


def transplant_conv2d_wrapper(tmod, has_bn):
    """reference Conv2d wrapper → ConvBlock params."""
    seq = tmod.conv
    p = {"conv": {"kernel": t2j_conv(seq[0].weight)}}
    if seq[0].bias is not None:
        p["conv"]["bias"] = jnp.asarray(seq[0].bias.detach().numpy())
    stats = {}
    if has_bn:
        bn = seq[1]
        p["norm"] = {"scale": jnp.asarray(bn.weight.detach().numpy()),
                     "bias": jnp.asarray(bn.bias.detach().numpy())}
        stats["norm"] = {"mean": jnp.asarray(bn.running_mean.numpy()),
                         "var": jnp.asarray(bn.running_var.numpy())}
    return p, stats


@pytest.mark.parametrize("k,stride,bn,act", [
    (3, 1, None, "relu"), (5, 2, None, "lrelu"), (1, 1, None, "tanh"),
    (3, 1, "batch", "relu"), (3, 2, "instance", "lrelu"),
])
def test_conv2d_wrapper_parity(k, stride, bn, act):
    x = rand(2, 16, 16, 3)
    tmod = blocks.Conv2d(3, 8, k, stride=stride, bn=bn, activate=act)
    tmod.eval()
    with torch.no_grad():
        ty = to_nhwc(tmod(nchw(x)))
    jmod = ConvBlock(8, k, stride=stride, bn=bn, activate=act)
    p, stats = transplant_conv2d_wrapper(tmod, bn == "batch")
    variables = {"params": p}
    if stats:
        variables["batch_stats"] = stats
    jy = jmod.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jy), ty, atol=2e-5)


def test_linear_wrapper_parity():
    x = rand(4, 12)
    tmod = blocks.Linear(12, 7, activate="lrelu")
    tmod.eval()
    with torch.no_grad():
        ty = tmod(torch.from_numpy(x)).numpy()
    p = {"fc": {"kernel": t2j_lin(tmod.fc[0].weight),
                "bias": jnp.asarray(tmod.fc[0].bias.detach().numpy())}}
    jy = DenseBlock(7, activate="lrelu").apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty, atol=2e-5)


def test_scse_parity():
    x = rand(2, 8, 8, 32)
    tmod = blocks.SCSEBlock(32, reduction=16)
    tmod.eval()
    with torch.no_grad():
        ty = to_nhwc(tmod(nchw(x)))
    p = {
        "cse_reduce": {"kernel": t2j_conv(tmod.cSE[1].weight),
                       "bias": jnp.asarray(tmod.cSE[1].bias.detach().numpy())},
        "cse_expand": {"kernel": t2j_conv(tmod.cSE[3].weight),
                       "bias": jnp.asarray(tmod.cSE[3].bias.detach().numpy())},
        "sse": {"kernel": t2j_conv(tmod.sSE[0].weight),
                "bias": jnp.asarray(tmod.sSE[0].bias.detach().numpy())},
    }
    jy = SCSEBlock(reduction=16).apply({"params": p}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty, atol=2e-5)


def test_self_attention_parity():
    x = rand(2, 6, 6, 16)
    tmod = blocks.SelfAttentionBlock(16)
    with torch.no_grad():
        tmod.gamma.fill_(0.7)  # nonzero so the attention path matters
    tmod.eval()
    with torch.no_grad():
        ty = to_nhwc(tmod(nchw(x)))
    p = {}
    for name, sub in (("q", tmod.q), ("k", tmod.k), ("v", tmod.v)):
        pc, _ = transplant_conv2d_wrapper(sub, False)
        p[name] = pc
    p["gamma"] = jnp.asarray([0.7])
    jy = SelfAttentionBlock().apply({"params": p}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jy), ty, atol=1e-4)


def test_add_coords_parity():
    x = rand(2, 5, 7, 3)
    for norm in (False, True):
        tmod = blocks.AddCoords(if_normalize=norm)
        with torch.no_grad():
            ty = to_nhwc(tmod(nchw(x)))
        jy = AddCoords(if_normalize=norm)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(jy), ty, atol=1e-6)


def test_down_parity():
    x = rand(2, 16, 16, 4)
    tmod = blocks.Down(4, 8, 3, if_add_coord=True)
    tmod.eval()
    with torch.no_grad():
        ty = to_nhwc(tmod(nchw(x)))
    pc, _ = transplant_conv2d_wrapper(tmod.conv, False)
    jy = Down(8, 3, if_add_coord=True).apply(
        {"params": {"conv": pc}}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jy), ty, atol=2e-4)


def test_up_parity():
    x = rand(2, 8, 8, 4)
    tmod = blocks.Up(4, 8, if_add_coord=True)
    tmod.eval()
    with torch.no_grad():
        ty = to_nhwc(tmod(nchw(x)))
    p, stats = {}, {}
    for i, name in ((0, "conv1"), (1, "conv2")):
        p[name], s = transplant_conv2d_wrapper(tmod.conv[i], True)
        stats[name] = s
    jy = Up(8, if_add_coord=True).apply(
        {"params": p, "batch_stats": stats}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jy), ty, atol=2e-4)
