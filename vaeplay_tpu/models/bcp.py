"""BCP — contour point classification + regression with adversarial training.

Rebuild of reference models/networks_BCP.py with the fixed-capacity + mask
convention replacing every ragged repack (the reference concatenates valid
points across the batch, networks_BCP.py:206-210; here heads run over the
full (B, P) grid and losses mask padding).

  TMPBlock        networks_BCP.py:18-35  (3x3[s]-1x1-3x3 lrelu convs)
  ContentEndoer   networks_BCP.py:37-68  (dual 8-block towers, no-norm +
                   instance-norm, concat → 128ch at stride 4; out_size=128)
  ClassPredictor  networks_BCP.py:220-251 (solid-vs-emit 2-class head)
  LinePredictor   networks_BCP.py:96-218 (global "frequency" image embedding,
                   per-point bilinear feature gather at given contours, concat
                   [pt-feat, pt-xy, global-feat, detached class softmax] →
                   offset + frequency heads)
  ComposeNet      networks_BCP.py:253-304 (training uses GT contours from
                   targets :270-276; eval extracts contours from input
                   channel 1 on the host :277-289)
  Discriminator   networks_BCP.py:306-363 (global conv branch + local linear
                   branch over padded (P, 4) point sets → sigmoid real/fake)
"""

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vaeplay_tpu.core.layers import (
    ConvBlock, DenseBlock, PointSelfAttentionBlock, add_coords)
from vaeplay_tpu.ops.image import grid_sample

VALUE_WEIGHT = 10.0


class TMPBlock(nn.Module):
    features: int
    if_down: bool = False
    bn: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        s = 2 if self.if_down else 1
        x = ConvBlock(self.features, 3, stride=s, bn=self.bn, activate="lrelu",
                      name="c0")(x, train=train)
        x = ConvBlock(self.features, 1, activate="lrelu", name="c1")(x, train=train)
        x = ConvBlock(self.features, 3, bn=self.bn, activate="lrelu",
                      name="c2")(x, train=train)
        return x


class ContentEndoer(nn.Module):
    """Dual towers (plain + instance-norm) concatenated (BCP :37-68).

    `blocks` < 8 selects a slim variant (same dual-tower/stride topology,
    fewer TMPBlocks) for dryrun/SPMD-structure tests; default is the
    reference's 8."""

    out_size: int = 128      # reference constant (spatial size at 512px input)
    out_channels: int = 128
    blocks: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        def tower(bn, prefix):
            y = x
            for i in range(self.blocks):
                y = TMPBlock(64, if_down=i < 2, bn=bn, name=f"{prefix}{i}")(
                    y, train=train)
            return y

        return jnp.concatenate(
            [tower(None, "a"), tower("instance", "b")], axis=-1
        )


class ClassPredictor(nn.Module):
    in_size: int = 128
    num_classes: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        out_c = min(c * 2, 2048)
        for i in range(int(math.log2(self.in_size)) - 1):
            x = ConvBlock(out_c, 3, stride=2, name=f"conv{i}")(x, train=train)
            c = out_c
            out_c = min(c * 2, 2048)
        x = jnp.mean(x, axis=(1, 2))
        x = DenseBlock(c // 2, activate="lrelu", name="fc0")(x)
        x = DenseBlock(c // 4, activate="lrelu", name="fc1")(x)
        return DenseBlock(self.num_classes, activate=None, name="fc2")(x)


class LinePredictor(nn.Module):
    """point_attention enables the 3-block point self-attention stack at the
    site of the reference's commented-out `batch_attention`
    (networks_BCP.py:122-126, applied at :196) / its dead ValueEncoder
    attention (:70-94).  Off by default to match the reference's shipped
    semantics; when on, the attention runs over the full pt_size axis and —
    with a RingRouting handle over a model-axis mesh — shards that axis
    across chips (the repo's context-parallel path, SURVEY.md §2.3)."""

    image_size: int = 128  # = encoder out_size in the reference ctor call
    pt_size: int = 2048
    in_channels: int = 128
    point_attention: bool = False
    ring: Optional[Any] = None  # ops.attention.RingRouting (CP over points)

    @nn.compact
    def __call__(self, x: jnp.ndarray, contours: jnp.ndarray,
                 counts: jnp.ndarray, x_cls: jnp.ndarray, train: bool = True):
        b = x.shape[0]
        c = self.in_channels
        p = self.pt_size
        # per-point feature gather (batched; reference loops, :149-173)
        pt_feat = grid_sample(x, contours, align_corners=False, mode="bilinear")
        valid = (jnp.arange(p)[None, :] < counts[:, None])
        pt_feat = pt_feat * valid[..., None].astype(pt_feat.dtype)
        pt_cnts = contours * valid[..., None].astype(contours.dtype)

        # global "frequency" embedding (:102-118); level = int(ln(size)) - 1
        level = int(math.log(self.image_size)) - 1
        y = x
        cc, out_c = c, min(self.in_channels, c * 2)
        for i in range(level):
            y = ConvBlock(out_c, 3, stride=2, bn="instance", activate="lrelu",
                          name=f"freq{i}")(y, train=train)
            cc = out_c
            out_c = min(self.in_channels, cc * 2)
        y = ConvBlock(self.in_channels, 1, activate="lrelu", name="freq_out")(
            y, train=train)
        y = jnp.mean(y, axis=(1, 2))
        y = DenseBlock(self.in_channels, activate="lrelu", name="freq_fc0")(y)
        y = DenseBlock(self.in_channels, activate=None, name="freq_fc1")(y)
        y = DenseBlock(self.in_channels, activate=None, name="freq_fc2")(y)

        cls_soft = jax.nn.softmax(x_cls, axis=-1)
        feat = jnp.concatenate(
            [
                pt_feat,                                    # (B, P, C)
                pt_cnts,                                    # (B, P, 2)
                jnp.broadcast_to(y[:, None, :], (b, p, c)),  # (B, P, C)
                jnp.broadcast_to(cls_soft[:, None, :], (b, p, cls_soft.shape[-1])),
            ],
            axis=-1,
        )                                                    # (B, P, 2C+4)
        if self.point_attention:
            for i in range(3):
                feat = PointSelfAttentionBlock(ring=self.ring, name=f"battn{i}")(
                    feat, train=train)
        d = feat.shape[-1]
        f = DenseBlock(d, activate="lrelu", name="fh0")(feat)
        f = DenseBlock(d, activate="lrelu", name="fh1")(f)
        merged = jnp.concatenate([feat, f], axis=-1)
        pred = DenseBlock(d * 2, activate="lrelu", name="pp0")(merged)
        pred = DenseBlock(d, activate="lrelu", name="pp1")(pred)
        pred = DenseBlock(2, activate=None, name="pp2")(pred)       # offsets
        fr = DenseBlock(d, activate="lrelu", name="fp0")(f)
        fr = DenseBlock(d, activate="lrelu", name="fp1")(fr)
        fr = nn.sigmoid(DenseBlock(1, activate=None, name="fp2")(fr))[..., 0]
        return pred, fr


class ComposeNet(nn.Module):
    image_size: int = 512
    pt_size: int = 2048
    point_attention: bool = False
    # ring: explicit context-parallel routing handle for the point-attention
    # stack (ops.attention.RingRouting); None = never ring.
    ring: Optional[Any] = None
    # slim knobs for dryrun/SPMD-structure tests (defaults = reference shape)
    encoder_blocks: int = 8
    encoder_out_size: int = 128

    def setup(self):
        self.encoder = ContentEndoer(out_size=self.encoder_out_size,
                                     blocks=self.encoder_blocks)
        self.cls_classifier = ClassPredictor(in_size=self.encoder.out_size)
        self.line_predictor = LinePredictor(
            image_size=self.encoder.out_size, pt_size=self.pt_size,
            in_channels=self.encoder.out_channels,
            point_attention=self.point_attention,
            ring=self.ring,
        )

    def __call__(self, x: jnp.ndarray, contours: jnp.ndarray,
                 counts: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        """x: (B, H, W, 3) [img, bmask, emask]; contours: (B, P, 2) normalized
        [-1, 1] coords (GT during training, host-extracted at eval);
        counts: (B,) valid point counts."""
        h = add_coords(x, normalize=True)
        h = self.encoder(h, train=train)
        x_cls = self.cls_classifier(h, train=train)
        pred_pts, pred_freq = self.line_predictor(
            h, contours, counts, jax.lax.stop_gradient(x_cls), train=train
        )
        return {
            "classes": x_cls,
            "contours": contours,
            "contour_counts": counts,
            "target_pts": pred_pts,
            "target_frequency": pred_freq,
        }


def eval_contours_from_masks(
    x: np.ndarray, max_points: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Eval-path contour source (networks_BCP.py:277-289): trace channel 1
    (content mask) on the host, decimate, normalize to [-1, 1]."""
    from vaeplay_tpu.ops.contour import find_contour, resample_points

    b, h = x.shape[0], x.shape[1]
    pts = np.zeros((b, max_points, 2), np.float32)
    counts = np.zeros((b,), np.int32)
    for i in range(b):
        cnt = find_contour(np.asarray(x[i, :, :, 1], np.float32), level=0.8)
        cnt = resample_points(cnt, max_points)
        n = min(len(cnt), max_points)
        if n:
            pts[i, :n] = (cnt[:n] / h - 0.5) / 0.5
        counts[i] = n
    return pts, counts


class Discriminator(nn.Module):
    image_size: int = 512
    pt_size: int = 2048

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, targets: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        """imgs (B, H, W, 3); targets (B, P, 4) zero-padded [x, y, dx, dy]."""
        max_channels = 512
        level = int(math.log2(self.image_size)) - 2 - 1
        y = ConvBlock(32, 3, stride=2, activate="lrelu", name="g0")(imgs, train=train)
        c, out_c = 32, min(64, max_channels)
        for i in range(level - 1):
            y = ConvBlock(out_c, 3, stride=2, bn="instance", activate="lrelu",
                          name=f"g{i+1}")(y, train=train)
            c = out_c
            out_c = min(c * 2, max_channels)
        y = ConvBlock(max_channels, 1, activate="lrelu", name="g_out")(y, train=train)
        global_feat = jnp.mean(y, axis=(1, 2))

        t = targets.reshape(targets.shape[0], -1)
        c_in = self.pt_size * 4
        out_c = min(c_in // 2, max_channels)
        for i in range(level):
            t = DenseBlock(c_in, use_bias=False, activate="tanh",
                           name=f"l{i}a")(t)
            t = DenseBlock(out_c, use_bias=False, activate=None,
                           name=f"l{i}b")(t)
            c_in = out_c
            out_c = min(c_in // 2, max_channels)
        local_feat = DenseBlock(max_channels, use_bias=False, activate="lrelu",
                                name="l_out")(t)

        m = jnp.concatenate([global_feat, local_feat], axis=1)
        m = DenseBlock(max_channels * 2, activate="lrelu", name="m0")(m)
        m = DenseBlock(max_channels, activate="lrelu", name="m1")(m)
        m = DenseBlock(max_channels, activate="lrelu", name="m2")(m)
        m = DenseBlock(max_channels // 2, activate="lrelu", name="m3")(m)
        m = DenseBlock(1, use_bias=False, activate=None, name="m4")(m)
        return nn.sigmoid(m)[..., 0]
