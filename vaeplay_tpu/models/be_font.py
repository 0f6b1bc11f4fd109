"""BE_font — conditional kana-mask generation (ACGAN-style).

Rebuild of reference models/networks_BE_font.py: a U-Net generator whose
bottleneck is conditioned on either (one-hot class, 5-dim style) embeddings
(training) or a style encoding of the input image itself (eval), plus an
adversarial + 143-way auxiliary classifier discriminator pair.

  EmbedingBlock         networks_BE_font.py:21-46  (2 linears → 3 attention
                         blocks over a single position → 2 lrelu linears)
  StyleEncodeBlock      networks_BE_font.py:48-69
  ParameterEmbedingNet  networks_BE_font.py:71-85  (in_type "embed": 143+5
                         inputs; "image": two image encoders)
  MaskNet/EdgeNet       networks_BE_font.py:87-123
  ComposeNet            networks_BE_font.py:125-234 (U-Net, bottleneck concat
                         [flattened feat, cls embed, style embed] → relay FC)
  Classifier            networks_BE_font.py:236-267
  Discriminator         networks_BE_font.py:269-278 (adv sigmoid + aux logits)
"""

import math
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from vaeplay_tpu.core.layers import ConvBlock, DenseBlock, SelfAttentionBlock, Up

LABEL_EMBED = 256
STYLE_EMBED = 256
NUM_CLASSES = 143
STYLE_DIM = 5


class EmbedingBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = DenseBlock(self.out_channels, activate=None, name="fc0")(x)
        x = DenseBlock(self.out_channels, activate=None, name="fc1")(x)
        # (B, C) → NHWC (B, 1, 1, C): attention over a single position
        y = x[:, None, None, :]
        for i in range(3):
            y = SelfAttentionBlock(name=f"attn{i}")(y, train=train)
        y = y.reshape(y.shape[0], -1)
        y = DenseBlock(self.out_channels, activate="lrelu", name="e0")(y)
        y = DenseBlock(self.out_channels, activate="lrelu", name="e1")(y)
        return y


class StyleEncodeBlock(nn.Module):
    out_channels: int
    in_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        repeat_num = int(math.log2(self.in_size)) - 3
        y = ConvBlock(64, 3, stride=2, bn="instance", name="c0")(x, train=train)
        c, out_c = 64, min(128, self.out_channels)
        for i in range(repeat_num):
            y = ConvBlock(out_c, 3, stride=2, bn="instance", name=f"c{i+1}")(
                y, train=train)
            c = out_c
            out_c = min(c * 2, self.out_channels)
        y = ConvBlock(self.out_channels, 1, bn="instance", name="c_out")(y, train=train)
        return jnp.mean(y, axis=(1, 2))


class EmbedPair(nn.Module):
    """ParameterEmbedingNet in_type='embed' (one-hot cls + style vector)."""

    @nn.compact
    def __call__(self, y_cls, y_style, train: bool = True):
        a = EmbedingBlock(LABEL_EMBED, name="label")(y_cls, train=train)
        b = EmbedingBlock(STYLE_EMBED, name="style")(y_style, train=train)
        return a, b


class StylePair(nn.Module):
    """ParameterEmbedingNet in_type='image' (two image encoders)."""

    in_size: int

    @nn.compact
    def __call__(self, x_a, x_b, train: bool = True):
        a = StyleEncodeBlock(LABEL_EMBED, self.in_size, name="label")(x_a, train=train)
        b = StyleEncodeBlock(STYLE_EMBED, self.in_size, name="style")(x_b, train=train)
        return a, b


class MaskNet(nn.Module):
    in_channel: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = self.in_channel
        x = ConvBlock(c, 3, bn="instance", name="p0")(x, train=train)
        x = ConvBlock(c, 3, bn="instance", name="p1")(x, train=train)
        return ConvBlock(1, 3, activate=None, name="p2")(x, train=train)


class EdgeNet(MaskNet):
    pass


class ComposeNet(nn.Module):
    in_size: int = 64
    min_channel: int = 64
    max_channel: int = 512

    def setup(self):
        self.repeat_num = int(math.log2(self.in_size // 4))
        downs = [ConvBlock(self.min_channel, 3, bn="instance")]
        chans = []
        c, out_c = self.min_channel, min(self.min_channel * 2, self.max_channel)
        for _ in range(self.repeat_num):
            downs.append(
                (ConvBlock(out_c, 3, stride=2, bn="batch"),
                 ConvBlock(out_c, 3, bn="instance"))
            )
            chans.append((c, out_c))
            c, out_c = out_c, min(out_c * 2, self.max_channel)
        self.down0 = downs[0]
        self.down_blocks = downs[1:]
        self.bottleneck_c = c
        self.embeding_block = EmbedPair()
        self.style_encoder = StylePair(in_size=self.in_size)
        relay_in = c * 4 * 4
        self.relay0 = DenseBlock(relay_in)
        self.relay1 = DenseBlock(relay_in)
        # up/skip/cat indexed like the reference lists (idx 0 = shallowest)
        self.ups = [Up(inc) for (inc, outc) in chans]
        self.skips = [ConvBlock(inc, 3, bn="instance") for (inc, outc) in chans]
        self.cats = [ConvBlock(inc, 3, bn="instance") for (inc, outc) in chans]
        self.mask_net = MaskNet(self.min_channel)
        self.edge_net = EdgeNet(self.min_channel)

    def init_all(self, x: jnp.ndarray, y: Dict) -> Dict[str, jnp.ndarray]:
        """Init helper: touches BOTH conditioning branches so lazy flax param
        creation covers the label-embedding and the image-style paths (torch
        builds both in __init__ unconditionally)."""
        _ = self.style_encoder(x, x, train=True)
        return self(x, y=y, train=True)

    def __call__(self, x: jnp.ndarray, y: Optional[Dict] = None,
                 train: bool = True) -> Dict[str, jnp.ndarray]:
        """y = {"cls": (B, 143) one-hot, "cnt_style": (B, 5)} for training;
        None at eval → style self-encoded from the input image
        (networks_BE_font.py:188-193)."""
        if y is not None:
            y_cls, y_style = self.embeding_block(y["cls"], y["cnt_style"], train=train)
        else:
            y_cls, y_style = self.style_encoder(x, x, train=train)

        feats = []
        h = self.down0(x, train=train)
        feats.append(h)
        for conv_a, conv_b in self.down_blocks:
            h = conv_a(h, train=train)
            h = conv_b(h, train=train)
            feats.append(h)

        b, hh, ww, cc = h.shape
        flat = h.reshape(b, -1)
        flat = jnp.concatenate([flat, y_cls, y_style], axis=1)
        flat = self.relay0(flat)
        flat = self.relay1(flat)
        h = flat.reshape(b, hh, ww, cc)

        n = len(self.ups)
        for i in range(n):
            idx = n - 1 - i
            h_up = self.ups[idx](h, train=train)
            h_skip = self.skips[idx](feats[len(feats) - 2 - i], train=train)
            h = self.cats[idx](jnp.concatenate([h_up, h_skip], axis=-1), train=train)

        return {
            "masks": self.mask_net(h, train=train),
            "edges": self.edge_net(h, train=train),
        }


class Classifier(nn.Module):
    in_size: int = 64
    num_classes: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Dict, train: bool = True) -> jnp.ndarray:
        h = ConvBlock(64, 3, stride=2, bn="instance", activate="lrelu",
                      name="c0")(x, train=train)
        for i, (c, bn) in enumerate([(128, "instance"), (256, "instance"),
                                     (512, "batch"), (1024, "batch")]):
            h = ConvBlock(c, 3, stride=2, bn=bn, activate="lrelu",
                          name=f"c{i+1}")(h, train=train)
        h = h.reshape(h.shape[0], -1)
        y_cls, y_style = EmbedPair(name="embed")(y["cls"], y["cnt_style"], train=train)
        h = jnp.concatenate([h, y_cls, y_style], axis=1)
        in_flat = 1024 * (self.in_size // 32) ** 2
        h = DenseBlock(in_flat // 2, activate="lrelu", name="fc0")(h)
        h = DenseBlock(in_flat // 4, activate="lrelu", name="fc1")(h)
        return DenseBlock(self.num_classes, activate=None, name="fc2")(h)


class Discriminator(nn.Module):
    in_size: int = 64
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Dict, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        adv = Classifier(self.in_size, 1, name="adv_convs")(x, y, train=train)
        aux = Classifier(self.in_size, self.num_classes, name="aux_convs")(
            x, y, train=train)
        return nn.sigmoid(adv), aux
