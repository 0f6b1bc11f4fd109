"""Equivalence tests for the TPU-layout-friendly exact-math rewrites:
SmallChannelConv3x3S2 (space-to-depth conv), OneChannelConv3x3 (shifted
multiplies), and the bit-packed mask bridge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.core.layers import SmallChannelConv3x3S2
from vaeplay_tpu.models.bc import OneChannelConv3x3
from vaeplay_tpu.train.steps_bc import unpack_mask_bits


@pytest.mark.parametrize("c,f,hw", [(2, 16, 32), (1, 8, 16), (3, 4, 64)])
def test_s2d_conv_equals_plain_conv(c, f, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, c)).astype(np.float32))
    mod = SmallChannelConv3x3S2(f, activate=None)
    v = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(v, x)
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_one_channel_conv_equals_plain_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 24, 24, 1)).astype(np.float32))
    mod = OneChannelConv3x3(activate=None)
    v = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(v, x)
    ref = jax.lax.conv_general_dilated(
        x, v["params"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_one_channel_conv_relu():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 1)).astype(np.float32))
    mod = OneChannelConv3x3(activate="relu")
    v = mod.init(jax.random.PRNGKey(0), x)
    assert float(jnp.min(mod.apply(v, x))) >= 0.0


def test_mask_bits_roundtrip():
    rng = np.random.default_rng(3)
    for w in (64, 66):  # divisible and non-divisible widths
        binary = (rng.uniform(size=(3, 10, w)) > 0.5).astype(np.uint8)
        pad_w = (-w) % 8
        padded = np.pad(binary, ((0, 0), (0, 0), (0, pad_w)))
        bits = padded.reshape(3, 10, -1, 8)
        weights = np.asarray([128, 64, 32, 16, 8, 4, 2, 1], np.uint8)
        packed = np.sum(bits * weights.astype(np.uint32), axis=-1).astype(np.uint8)
        out = unpack_mask_bits(packed, w)
        np.testing.assert_array_equal(out, binary.astype(np.float32))
