"""Unit tests for the core layer library against hand-derived torch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.core.layers import (
    AddCoords,
    ConvBlock,
    ConvTransposeBlock,
    DenseBlock,
    Down,
    SCSEBlock,
    SelfAttentionBlock,
    Up,
    add_coords,
    upsample2x_bilinear,
)


def init_and_apply(mod, x, **kwargs):
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, **kwargs)
    return mod.apply(variables, x, mutable=["batch_stats"], **kwargs)[0], variables


def test_conv_block_shapes_and_padding():
    x = jnp.ones((2, 16, 16, 3))
    for k in (1, 3, 5, 7):
        y, _ = init_and_apply(ConvBlock(8, k), x)
        assert y.shape == (2, 16, 16, 8), k
    y, _ = init_and_apply(ConvBlock(8, 3, stride=2), x)
    assert y.shape == (2, 8, 8, 8)
    # odd input, stride 2, k=5: torch floor((15 + 4 - 5)/2)+1 = 8
    y, _ = init_and_apply(ConvBlock(8, 5, stride=2), jnp.ones((2, 15, 15, 3)))
    assert y.shape == (2, 8, 8, 8)


def test_conv_block_norm_variants():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    y, variables = init_and_apply(ConvBlock(8, 3, bn="batch"), x, train=True)
    assert "batch_stats" in variables
    y2, _ = init_and_apply(ConvBlock(8, 3, bn="instance"), x)
    assert y2.shape == (4, 8, 8, 8)
    # relu output nonnegative
    assert float(jnp.min(y)) >= 0.0


def test_conv_block_activations():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 3))
    y_tanh, _ = init_and_apply(ConvBlock(4, 3, activate="tanh"), x)
    assert float(jnp.max(jnp.abs(y_tanh))) <= 1.0
    y_none, _ = init_and_apply(ConvBlock(4, 3, activate=None), x)
    assert float(jnp.min(y_none)) < 0.0  # unclamped


def test_lrelu_slopes():
    # ConvBlock lrelu slope must be 0.02 (blocks.py:28), DenseBlock 0.2 (:44)
    x = -jnp.ones((1, 1, 1, 1)) * 100.0
    mod = ConvBlock(1, 1, activate="lrelu")
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    # force kernel=1, bias=0 → pre-act = -100 → out = -2.0
    variables = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), variables)
    variables = {"params": {**variables["params"]}}
    variables["params"]["conv"]["bias"] = jnp.zeros_like(variables["params"]["conv"]["bias"])
    y = mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), -100 * 0.02, rtol=1e-5)

    xd = -jnp.ones((1, 1)) * 100.0
    dmod = DenseBlock(1, activate="lrelu")
    dvars = dmod.init({"params": jax.random.PRNGKey(0)}, xd)
    dvars = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), dvars)
    dvars = {"params": {**dvars["params"]}}
    dvars["params"]["fc"]["bias"] = jnp.zeros_like(dvars["params"]["fc"]["bias"])
    y = dmod.apply(dvars, xd)
    np.testing.assert_allclose(np.asarray(y), -100 * 0.2, rtol=1e-5)


def test_conv_transpose_matches_torch_shape_and_values():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 7, 3)).astype(np.float32)
    mod = ConvTransposeBlock(4, 5, stride=2, padding=2, output_padding=1)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(variables, jnp.asarray(x))
    assert y.shape == (2, 14, 14, 4)

    # value parity vs torch.nn.ConvTranspose2d with transplanted weights
    k = np.asarray(variables["params"]["kernel"])  # HWIO
    b = np.asarray(variables["params"]["bias"])
    tconv = torch.nn.ConvTranspose2d(3, 4, 5, stride=2, padding=2, output_padding=1)
    with torch.no_grad():
        # torch weight (in, out, kh, kw); jax kernel is HWIO and applied flipped
        tconv.weight.copy_(torch.from_numpy(k.transpose(2, 3, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(b))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = tconv(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)


def test_add_coords():
    x = jnp.zeros((2, 3, 5, 1))
    y = add_coords(x)
    assert y.shape == (2, 3, 5, 3)
    # channel 1 = i along width 0..4, channel 2 = j along height 0..2
    np.testing.assert_allclose(np.asarray(y[0, 0, :, 1]), np.arange(5))
    np.testing.assert_allclose(np.asarray(y[0, :, 0, 2]), np.arange(3))
    yn = add_coords(x, normalize=True)
    np.testing.assert_allclose(
        np.asarray(yn[0, 0, :, 1]), (np.arange(5) / 5 - 0.5) / 0.5, atol=1e-6
    )


def test_down_up_shapes():
    x = jnp.ones((2, 16, 16, 4))
    y, _ = init_and_apply(Down(8, 3, if_add_coord=True), x)
    assert y.shape == (2, 8, 8, 8)
    y, _ = init_and_apply(Up(8, if_add_coord=True), x)
    assert y.shape == (2, 32, 32, 8)


def test_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(1).normal(size=(1, 4, 4, 2)).astype(np.float32)
    y = upsample2x_bilinear(jnp.asarray(x))
    yt = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2, mode="bilinear"
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_scse_block():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 32))
    y, _ = init_and_apply(SCSEBlock(reduction=16), x)
    assert y.shape == x.shape


def test_self_attention_gamma_zero_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 16))
    mod = SelfAttentionBlock()
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)
    y = mod.apply(variables, x)
    # gamma starts at 0 → output == input (blocks.py:73,94)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
