"""Parameter initializers matching the reference's init schemes.

The reference uses three distinct schemes:
  * Kaiming-uniform fan-in / relu for convs + zero bias, ones/zeros for BN
    (reference tools/ops.py:216-229, `initialize_model`).
  * Kaiming-uniform with a=sqrt(5) for linear layers (same function).
  * A uniform(-s, s) scheme with s = 1/sqrt(3*fan_in) used by the circle
    VAE-GAN (reference models/networks.py:214-226, `init_parameters`).

These are reproduced here as flax-compatible initializers over NHWC/HWIO
layouts.  Distribution-level parity (same family + bounds), not bitwise RNG
parity, is the contract — see SURVEY.md §7 "Exact-parity RNG".
"""

import math

import jax
import jax.numpy as jnp


def _fan_in(shape, transpose: bool = False) -> int:
    """fan_in for a kernel.

    HWIO conv kernels: h*w*in.  (in, out) dense kernels: in.
    Matches torch's _calculate_fan_in_and_fan_out on the equivalent OIHW /
    (out, in) weights.  For ConvTranspose kernels torch's weight layout is
    (in, out, kh, kw), so its fan_in term is h*w*OUT — pass transpose=True
    for HWIO transpose-conv kernels to reproduce that
    (reference tools/ops.py:219; networks.py:214-226 shape[1:] products).
    """
    if len(shape) == 2:
        return int(shape[0])
    if len(shape) == 4:
        io = int(shape[3]) if transpose else int(shape[2])
        return int(shape[0] * shape[1]) * io
    if len(shape) == 1:
        return int(shape[0])
    raise ValueError(f"unsupported kernel shape {shape}")


def kaiming_uniform(a: float = 0.0, dtype=jnp.float32, transpose: bool = False):
    """torch.nn.init.kaiming_uniform_ equivalent (mode=fan_in).

    gain = sqrt(2 / (1 + a^2)); bound = gain * sqrt(3 / fan_in).
    a=0 is the conv scheme (nonlinearity='relu' → gain=sqrt(2));
    a=sqrt(5) is torch's default Linear scheme (reference tools/ops.py:226).
    transpose=True uses the ConvTranspose fan term (h*w*out).
    """

    def initializer(key, shape, dtype=dtype):
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / _fan_in(shape, transpose))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return initializer


def vaegan_uniform(dtype=jnp.float32, transpose: bool = False):
    """The circle VAE-GAN init (reference models/networks.py:214-226).

    scale = 1/sqrt(prod(weight.shape[1:]))/sqrt(3) on torch weights,
    i.e. 1/sqrt(3 * fan_in); weights ~ U(-scale, scale), biases zero.
    torch weight.shape[1:] is in*kh*kw for Conv but OUT*kh*kw for
    ConvTranspose — pass transpose=True for HWIO transpose kernels.
    """

    def initializer(key, shape, dtype=dtype):
        scale = 1.0 / math.sqrt(3.0 * _fan_in(shape, transpose))
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return initializer


# Canonical instances.
conv_kaiming = kaiming_uniform(a=0.0)
dense_kaiming = kaiming_uniform(a=math.sqrt(5.0))
transpose_conv_kaiming = kaiming_uniform(a=0.0, transpose=True)
zeros = jax.nn.initializers.zeros
ones = jax.nn.initializers.ones
