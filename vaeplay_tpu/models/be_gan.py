"""BE_GAN — bubble mask/edge segmentation with an adversarial feature-matching
discriminator.  Rebuild of reference models/networks_BE_GAN.py.

  ComposeNet (G)  networks_BE_GAN.py:39-73  (resnet50-FPN level "0" + aux conv
                   chain 256→64, MaskNet/EdgeNet heads on 64ch)
  MaskMapper      networks_BE_GAN.py:75-114 (img-ch0+mask concat → strided
                   lrelu convs; returns pooled feature + per-stage flattened
                   feature list scaled by (idx//2 + 1))
  Discriminator   networks_BE_GAN.py:116-140 (content + boundary MaskMapper
                   pair → 3-linear type head over num_classes)
"""

import math
from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vaeplay_tpu.core.layers import ConvBlock, DenseBlock, SmallChannelConv3x3S2, Up
from vaeplay_tpu.models.backbone import ResNetFPN
from vaeplay_tpu.models.be import EdgeNet, MaskNet


class ComposeNet(nn.Module):
    """Generator: like BE's ComposeNet but with 64-channel heads."""

    target_out_channels: int = 64
    # slim variants (see backbone.ResNet50) for dryrun/SPMD-structure tests
    backbone_layers: tuple = (3, 4, 6, 3)
    backbone_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        feats = ResNetFPN(layers=self.backbone_layers,
                          base_width=self.backbone_width, name="backbone")(x)
        y = feats["0"]
        c = y.shape[-1]
        i = 0
        while c > self.target_out_channels:
            y = ConvBlock(c // 2, 1, bn="batch", name=f"aux{i}a")(y, train=train)
            y = ConvBlock(c // 2, 3, bn="batch", name=f"aux{i}b")(y, train=train)
            c //= 2
            i += 1
        mask_out = MaskNet(in_channel=c, name="mask_net")(y, train=train)
        edge_out = EdgeNet(in_channel=c, name="edge_net")(y, train=train)
        return {"masks": mask_out, "edges": edge_out}


class MaskMapper(nn.Module):
    """(img-ch, mask) pair → (pooled feature, concatenated stage features)."""

    in_size: int = 512
    max_channel: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, m: jnp.ndarray, train: bool = True):
        y = jnp.concatenate([x, m], axis=-1)
        # 2-channel stem via the space-to-depth formulation: the generator
        # phase needs input gradients through this conv, which are lane-
        # padded 64x in the naive layout (see SmallChannelConv3x3S2)
        y = SmallChannelConv3x3S2(16, activate="lrelu", name="conv0")(y, train=train)
        y = ConvBlock(32, 3, stride=2, activate="lrelu", name="conv1")(y, train=train)
        repeat_num = int(math.log2(self.in_size // 16)) - 2
        if repeat_num < 1:
            raise ValueError(
                f"MaskMapper needs in_size >= 128 (got {self.in_size}); the "
                "reference formula log2(in_size/16)-2 (networks_BE_GAN.py:79) "
                "yields an empty feature list below that."
            )
        c, out_c = 32, min(64, self.max_channel)
        feat_list = []
        for idx in range(repeat_num):
            y = ConvBlock(out_c, 3, stride=2, bn="batch", activate="lrelu",
                          name=f"feat{idx}a")(y, train=train)
            y = ConvBlock(out_c, 3, stride=1, bn="batch", activate="lrelu",
                          name=f"feat{idx}b")(y, train=train)
            feat_list.append(y.reshape(y.shape[0], -1) * (idx // 2 + 1))
            c = out_c
            out_c = min(c * 2, self.max_channel)
        feats = jnp.concatenate(feat_list, axis=1)
        y = ConvBlock(self.max_channel, 1, activate=None, name="pool_conv")(y, train=train)
        pooled = jnp.mean(y, axis=(1, 2))
        return pooled, feats


class Discriminator(nn.Module):
    """Content+boundary MaskMapper pair → num_classes type logits + features.

    Consumes only channel 0 of the image (networks_BE_GAN.py:131)."""

    in_size: int = 512
    num_classes: int = 4
    max_channel: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, m1: jnp.ndarray, m2: jnp.ndarray,
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x0 = x[..., 0:1]
        p1, f1 = MaskMapper(self.in_size, self.max_channel, name="content_disc")(
            x0, m1, train=train)
        p2, f2 = MaskMapper(self.in_size, self.max_channel, name="boundary_disc")(
            x0, m2, train=train)
        feats = jnp.concatenate([f1, f2], axis=1)
        y = jnp.concatenate([p1, p2], axis=1)
        y = DenseBlock(self.max_channel * 2, activate="lrelu", name="pred0")(y)
        y = DenseBlock(self.max_channel, activate="lrelu", name="pred1")(y)
        y = DenseBlock(self.num_classes, use_bias=False, activate=None, name="pred2")(y)
        return y, feats
