"""Style_GAN — bubble style VAE-GAN (style transfer between bubble types).

Rebuild of reference models/network_Style_GAN.py:
  StyleEncoder  :12-43  (strided conv stack → fc_mu / fc_logvar VAE head)
  StyleUp       :45-65  (ConvTranspose 4/2/1 + IN + relu, skip concat,
                         conv + 2x SCSE(reduction=4) + relu)
  myConv2d      :72-79  (label-gated dual conv: out = a*(1-y) + b*y)
  Generator     :81-180 (z → MLP → full-image plane concatenated as a 4th
                         input channel; label-conditioned U-Net; tanh head)
  MLP           :182-199
  Discriminator :201-229 (trunk on [x, x_content] concat → sigmoid adv map +
                         softmax class head — the softmax is applied in the
                         model exactly as the reference does, and the trainer
                         then feeds it to cross-entropy, reproducing the
                         reference's double-softmax faithfully)
"""

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vaeplay_tpu.core.layers import (
    ConvBlock, ConvTransposeBlock, DenseBlock, SCSEBlock,
    SmallChannelConv3x3S1, depth_to_space, space_to_depth,
)

IMAGE_CHANNEL = 3


class StyleEncoder(nn.Module):
    z_dim: int = 512
    image_size: int = 256
    max_channels: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = ConvBlock(64, 5, activate=None, name="c0")(x, train=train)
        c = 64
        n_level = int(math.log2(self.image_size)) - 2
        for i in range(n_level):
            c = min(c * 2, self.max_channels)
            y = ConvBlock(c, 3, stride=2, bn="instance", name=f"c{i+1}")(
                y, train=train)
        y = ConvBlock(c, 3, stride=2, name="c_extra0")(y, train=train)
        y = ConvBlock(c, 3, stride=2, name="c_extra1")(y, train=train)
        y = y.reshape(y.shape[0], -1)
        mu = DenseBlock(self.z_dim, activate=None, name="fc_mu")(y)
        logvar = DenseBlock(self.z_dim, activate=None, name="fc_logvar")(y)
        return mu, logvar


class MyConv2d(nn.Module):
    """Label-gated dual conv (network_Style_GAN.py:72-79).

    The reference form computes BOTH branch convs for every sample and
    blends `a*(1-y) + b*y` — 2x the conv FLOPs the math needs, since each
    sample uses exactly one branch.  `split=(k0p, k1p)` enables the
    label-bucketed form for batches SORTED by label (all label-0 rows
    first): conv_1 runs on the first k0p rows, conv_2 on the last k1p rows,
    and the same gate formula assembles the output.  Exact for any static
    k0p >= #label-0 and k1p >= #label-1 (rows outside a branch's slice have
    the gate weight for that branch identically 0, so the zero-padding never
    reaches the output; all ops in ConvBlock — conv, bias, instance norm,
    activation — are per-sample).  FLOPs scale by (k0p+k1p)/(2B) vs the
    blended form; split sizes are trace-time constants so each bucket is
    one compiled program (equivalence + gradient tests in
    tests/test_style_gan.py).
    """

    features: int
    kernel_size: int
    stride: int = 1
    bn: str = None
    activate: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, label: jnp.ndarray, train: bool = True,
                 split=None):
        conv_1 = ConvBlock(self.features, self.kernel_size, stride=self.stride,
                           bn=self.bn, activate=self.activate, name="conv_1")
        conv_2 = ConvBlock(self.features, self.kernel_size, stride=self.stride,
                           bn=self.bn, activate=self.activate, name="conv_2")
        lab = label.reshape(-1, 1, 1, 1).astype(x.dtype)
        if split is None:
            return conv_1(x, train=train) * (1.0 - lab) + conv_2(
                x, train=train) * lab
        k0p, k1p = split
        B = x.shape[0]
        if k0p <= 0:
            return conv_2(x[B - k1p:], train=train) * lab[B - k1p:]
        if k1p <= 0:
            return conv_1(x[:k0p], train=train) * (1.0 - lab[:k0p])
        a = conv_1(x[:k0p], train=train)
        b = conv_2(x[B - k1p:], train=train)
        pad = [(0, 0)] * (a.ndim - 1)
        a_full = jnp.pad(a, [(0, B - k0p)] + pad)
        b_full = jnp.pad(b, [(B - k1p, 0)] + pad)
        return a_full * (1.0 - lab) + b_full * lab


class StyleUp(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool = True):
        y = ConvTransposeBlock(self.features, 4, stride=2, padding=1,
                               output_padding=0, name="up")(x)
        # epsilon 1e-5 = torch InstanceNorm2d default (flax GroupNorm defaults
        # to 1e-6 — a transplant-parity mismatch caught by the trajectory gate)
        y = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                         use_scale=False, epsilon=1e-5, name="in")(y).astype(y.dtype)
        y = nn.relu(y)
        y = jnp.concatenate([y, skip], axis=-1)
        y = ConvBlock(self.features, 3, name="cat")(y, train=train)
        y = SCSEBlock(reduction=4, name="scse0")(y)
        y = SCSEBlock(reduction=4, name="scse1")(y)
        return nn.relu(y)


class MLP(nn.Module):
    nf_in: int
    nf_out: int
    num_blocks: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        x = DenseBlock(self.nf_in, activate=None, name="fc0")(x)
        ratio = int(2 ** (int(np.log2(self.nf_out / self.nf_in)) / (self.num_blocks - 1)))
        out_dim = self.nf_in
        for i in range(self.num_blocks - 2):
            out_dim = min(out_dim * ratio, self.nf_out)
            x = DenseBlock(out_dim, activate=None, name=f"fc{i+1}")(x)
        return DenseBlock(self.nf_out, activate=None, name="fc_out")(x)


class Generator(nn.Module):
    image_size: int = 256
    z_dim: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, style_code: jnp.ndarray,
                 labels: jnp.ndarray, train: bool = True,
                 split=None) -> jnp.ndarray:
        """split=(k0p, k1p): label-bucketed gated convs for batches sorted by
        label (see MyConv2d) — halves the gated-conv FLOPs on a balanced
        batch; None = the reference's both-branches blended form."""
        s = self.image_size
        plane = MLP(self.z_dim, s * s, 3, name="mlp")(style_code)
        plane = plane.reshape(-1, s, s, 1)
        h = jnp.concatenate([x, plane], axis=-1)
        h = MyConv2d(32, 3, activate=None, name="conv1")(h, labels, train=train, split=split)
        h = MyConv2d(32, 3, activate=None, name="conv2")(h, labels, train=train, split=split)
        d1 = MyConv2d(64, 4, stride=2, bn="instance", name="down1")(h, labels, train=train, split=split)
        d2 = MyConv2d(128, 4, stride=2, bn="instance", name="down2")(d1, labels, train=train, split=split)
        d3 = MyConv2d(256, 4, stride=2, bn="instance", name="down3")(d2, labels, train=train, split=split)
        d4 = MyConv2d(256, 4, stride=2, bn="instance", name="down4")(d3, labels, train=train, split=split)

        skip1 = ConvBlock(256, 3, bn="instance", name="skip1")(d3, train=train)
        up1 = StyleUp(256, name="up1")(d4, skip1, train=train)
        skip2 = ConvBlock(128, 3, bn="instance", name="skip2")(d2, train=train)
        up2 = StyleUp(128, name="up2")(up1, skip2, train=train)
        skip3 = ConvBlock(64, 3, bn="instance", name="skip3")(d1, train=train)
        up3 = StyleUp(64, name="up3")(up2, skip3, train=train)

        y = ConvTransposeBlock(32, 4, stride=2, padding=1, output_padding=0,
                               name="final_up")(up3)
        # full-resolution 32→32→32→3 tanh head in the space-to-depth(2)
        # domain: same canonical kernels (core/layers.SmallChannelConv3x3S1),
        # 4x the lane occupancy — measured 20.8 → 15.0 ms fwd+bwd per G
        # branch at the reference 256px bs32 bf16 workload
        # (tools/probe_style_decoder.py round-5 follow-up)
        z = space_to_depth(y, 2)
        z = SmallChannelConv3x3S1(32, block=2, name="final_c0")(z, train=train)
        z = SmallChannelConv3x3S1(32, block=2, name="final_c1")(z, train=train)
        z = SmallChannelConv3x3S1(IMAGE_CHANNEL, block=2, activate=None,
                                  name="final_c2")(z, train=train)
        return nn.tanh(depth_to_space(z, 2))


class Discriminator(nn.Module):
    image_size: int = 256
    num_classes: int = 2
    max_channels: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_content: jnp.ndarray,
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = jnp.concatenate([x, x_content], axis=-1)
        h = ConvBlock(64, 5, name="c0")(h, train=train)
        c = 64
        for i in range(int(math.log2(self.image_size)) - 2):
            c = min(c * 2, self.max_channels)
            h = ConvBlock(c, 3, stride=2, bn="instance", name=f"c{i+1}")(
                h, train=train)
        adv = ConvBlock(c, 3, stride=2, activate="lrelu", name="adv0")(h, train=train)
        adv = ConvBlock(1, 3, stride=2, activate=None, name="adv1")(adv, train=train)
        adv = nn.sigmoid(adv.reshape(adv.shape[0], -1))
        aux = ConvBlock(c, 3, stride=2, activate="lrelu", name="aux0")(h, train=train)
        aux = ConvBlock(self.num_classes, 3, stride=2, activate=None,
                        name="aux1")(aux, train=train)
        aux = nn.softmax(aux.reshape(aux.shape[0], -1), axis=-1)
        return adv, aux
