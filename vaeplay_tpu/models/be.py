"""BE — bubble content/boundary mask segmentation.

Rebuild of reference models/networks_BE.py: a resnet50-FPN feature net
(level "0", stride 4) with a 256→32 conv chain, and twin Up-Up-predictor
heads producing full-resolution mask and edge logits.

  FeatureNet   networks_BE.py:13-37  (aux chain: log2(256/32)=3 × [1x1 C→C/2
                                      +BN+relu, 3x3 C/2→C/2+BN+relu])
  MaskNet      networks_BE.py:39-58  (Up(+coords) ×2 then three 3x3 convs
                                      with no norm/activation)
  EdgeNet      networks_BE.py:60-66  (same architecture as MaskNet)
  ComposeNet   networks_BE.py:68-90  → {"edges", "masks"} logits, full res
"""

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from vaeplay_tpu.core.layers import (
    ConvBlock, SmallChannelConv3x3S1, Up, depth_to_space, space_to_depth)
from vaeplay_tpu.models.backbone import ResNetFPN


class FeatureNet(nn.Module):
    target_out_channels: int = 32
    # slim variants (see backbone.ResNet50) for dryrun/SPMD-structure tests
    backbone_layers: tuple = (3, 4, 6, 3)
    backbone_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        feats = ResNetFPN(layers=self.backbone_layers,
                          base_width=self.backbone_width, name="backbone")(x)
        y = feats["0"]  # stride 4 (networks_BE.py:35)
        c = y.shape[-1]
        i = 0
        while c > self.target_out_channels:
            y = ConvBlock(c // 2, 1, bn="batch", name=f"aux{i}a")(y, train=train)
            y = ConvBlock(c // 2, 3, bn="batch", name=f"aux{i}b")(y, train=train)
            c //= 2
            i += 1
        return y


class MaskNet(nn.Module):
    in_channel: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = self.in_channel
        x = Up(c // 4, if_add_coord=True, name="up1")(x, train=train)
        x = Up(c // 8, if_add_coord=True, name="up2")(x, train=train)
        # The 4-8-channel full-resolution predictor tail (networks_BE.py:54-58)
        # runs in the space-to-depth(4) domain: numerically identical to plain
        # 3x3 convs but without the 128-lane channel padding TPU applies to
        # tiny-channel convs at 512² (measured 15.4 ms → ~2 ms per head).
        z = space_to_depth(x, 4)
        z = SmallChannelConv3x3S1(c // 4, block=4, activate=None,
                                  name="pred1")(z, train=train)
        z = SmallChannelConv3x3S1(c // 8, block=4, activate=None,
                                  name="pred2")(z, train=train)
        z = SmallChannelConv3x3S1(1, block=4, activate=None,
                                  name="pred3")(z, train=train)
        return depth_to_space(z, 4)


class EdgeNet(MaskNet):
    pass


class ComposeNet(nn.Module):
    backbone_layers: tuple = (3, 4, 6, 3)
    backbone_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        feature = FeatureNet(backbone_layers=self.backbone_layers,
                             backbone_width=self.backbone_width,
                             name="feature_net")(x, train=train)
        mask_out = MaskNet(name="mask_net")(feature, train=train)
        edge_out = EdgeNet(name="edge_net")(feature, train=train)
        return {"edges": edge_out, "masks": mask_out}
