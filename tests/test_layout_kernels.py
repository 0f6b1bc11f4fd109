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


@pytest.mark.parametrize("c,f,hw,s,k", [(4, 8, 32, 4, 3), (8, 4, 32, 4, 3),
                                        (4, 1, 24, 8, 3), (1, 4, 16, 2, 3),
                                        (6, 8, 32, 4, 5), (3, 4, 24, 4, 5)])
def test_s1_s2d_conv_equals_plain_conv(c, f, hw, s, k):
    """Stride-1 space-to-depth conv: values AND input/kernel grads match the
    plain kxk conv with the same canonical kernel."""
    from vaeplay_tpu.core.layers import (
        SmallChannelConv3x3S1, depth_to_space, space_to_depth)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, c)).astype(np.float32))
    mod = SmallChannelConv3x3S1(f, block=s, kernel_size=k, activate=None)
    v = mod.init(jax.random.PRNGKey(0), space_to_depth(x, s))

    def via_s2d(params, xx):
        return depth_to_space(
            mod.apply({"params": params}, space_to_depth(xx, s)), s)

    def plain(params, xx):
        p = k // 2
        return jax.lax.conv_general_dilated(
            xx, params["kernel"], (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["bias"]

    got, ref = via_s2d(v["params"], x), plain(v["params"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    cot = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))
    g_got = jax.grad(lambda p, xx: jnp.sum(via_s2d(p, xx) * cot),
                     argnums=(0, 1))(v["params"], x)
    g_ref = jax.grad(lambda p, xx: jnp.sum(plain(p, xx) * cot),
                     argnums=(0, 1))(v["params"], x)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)


def test_s2d_roundtrip():
    from vaeplay_tpu.core.layers import depth_to_space, space_to_depth

    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 12, 12, 3)))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 3), 3)), np.asarray(x))


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
