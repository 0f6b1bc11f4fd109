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

from vaeplay_tpu.core import init as vinit
from vaeplay_tpu.core.layers import (
    ConvBlock, DenseBlock, PointSelfAttentionBlock, add_coords,
    apply_activation)
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


class MergedTMPBlock(nn.Module):
    """Both towers' TMPBlocks at one depth, evaluated as ONE 2f-channel
    block-diagonal conv stack.

    Math-identical to TMPBlock(f, bn=None) ("a" tower) and
    TMPBlock(f, bn="instance") ("b" tower) run side by side: each conv's two
    f-channel kernels sit on the diagonal of a 2f-channel kernel whose
    cross-tower blocks are zero, so the extra accumulated terms are exact
    zeros while the MXU sees full 128-lane operands.  Measured on the v5e
    chip: a 128-ch 3x3 conv runs at 3.05x the per-FLOP rate of a 64-ch one
    (tools/probe_bcp_encoder.py), so 2x the FLOPs net ~1.5x wall-clock.
    Tower b's parameter-free instance norm (torch affine=False,
    reference networks_BCP.py:24-28) applies to its half only — group_size=1
    normalizes per channel, so the half-slice is the same op.  Params stay
    per-tower (`{c}_kernel_a` / `{c}_kernel_b`, biases where the dual layout
    has them) with unchanged shapes, so init distributions are identical and
    `merge_encoder_params` converts the dual layout 1:1.
    """

    features: int = 64
    if_down: bool = False
    first: bool = False  # block 0: both halves read the shared raw input

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        f = self.features

        def conv(y, name, k, stride, shared_input, bias_b):
            in_c = y.shape[-1] if shared_input else y.shape[-1] // 2
            wa = self.param(f"{name}_kernel_a", vinit.conv_kaiming,
                            (k, k, in_c, f))
            wb = self.param(f"{name}_kernel_b", vinit.conv_kaiming,
                            (k, k, in_c, f))
            if shared_input:
                w = jnp.concatenate([wa, wb], axis=3)
            else:
                z = jnp.zeros_like(wa)
                w = jnp.concatenate(
                    [jnp.concatenate([wa, z], axis=3),
                     jnp.concatenate([z, wb], axis=3)], axis=2)
            p = (k - 1) // 2
            out = jax.lax.conv_general_dilated(
                y, w.astype(y.dtype), (stride, stride), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # tower a's ConvBlocks always carry bias (bn=None); tower b's
            # only where its ConvBlock has no norm (the 1x1 c1)
            ba = self.param(f"{name}_bias_a", vinit.zeros, (f,))
            bb = (self.param(f"{name}_bias_b", vinit.zeros, (f,))
                  if bias_b else jnp.zeros((f,), ba.dtype))
            return out + jnp.concatenate([ba, bb]).astype(out.dtype)

        def norm_b_half(y):
            # instance norm on tower b's half only (parameter-free).
            # Normalize ALL channels and select with an elementwise channel
            # mask instead of split/concat: group_size=1 stats are
            # per-channel, so the b-half values are identical, and the
            # mask select fuses where the split/concat pair forced two full
            # materializations of the (B,H,W,2f) activation per norm site
            # (measured: split/concat merged stack 58.7 ms vs 54.1 dual;
            # probe log in BENCH_FAMILIES.md round-3 notes).
            gn = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                              use_bias=False, use_scale=False)(y).astype(y.dtype)
            is_b = jnp.arange(y.shape[-1]) >= f
            return jnp.where(is_b, gn, y)

        s = 2 if self.if_down else 1
        y = conv(x, "c0", 3, s, self.first, bias_b=False)
        y = apply_activation(norm_b_half(y), "lrelu", 0.02)
        y = conv(y, "c1", 1, 1, False, bias_b=True)
        y = apply_activation(y, "lrelu", 0.02)
        y = conv(y, "c2", 3, 1, False, bias_b=False)
        return apply_activation(norm_b_half(y), "lrelu", 0.02)


class ContentEndoer(nn.Module):
    """Dual towers (plain + instance-norm) concatenated (BCP :37-68).

    `merged` (default) evaluates the two 64-ch towers as one 128-ch
    block-diagonal stack (MergedTMPBlock) — same math, ~1.5x faster on the
    MXU whose 128-lane output axis a 64-ch conv leaves half idle; the dual
    layout remains available for the equivalence test
    (tests/test_bcp.py) via merged=False + merge_encoder_params.

    `blocks` < 8 selects a slim variant (same dual-tower/stride topology,
    fewer TMPBlocks) for dryrun/SPMD-structure tests; default is the
    reference's 8."""

    out_size: int = 128      # reference constant (spatial size at 512px input)
    out_channels: int = 128
    blocks: int = 8
    merged: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.merged:
            y = x
            for i in range(self.blocks):
                y = MergedTMPBlock(64, if_down=i < 2, first=i == 0,
                                   name=f"m{i}")(y, train=train)
            return y

        def tower(bn, prefix):
            y = x
            for i in range(self.blocks):
                y = TMPBlock(64, if_down=i < 2, bn=bn, name=f"{prefix}{i}")(
                    y, train=train)
            return y

        return jnp.concatenate(
            [tower(None, "a"), tower("instance", "b")], axis=-1
        )


def merge_encoder_params(dual: Dict, blocks: int = 8) -> Dict:
    """Repack a dual-tower ContentEndoer param tree (a{i}/b{i} TMPBlocks)
    into the MergedTMPBlock layout.  Inverse-free by construction: kernels
    and biases are moved, never transformed."""
    out = {}
    for i in range(blocks):
        m = {}
        for c, bias_b in (("c0", False), ("c1", True), ("c2", False)):
            a = dual[f"a{i}"][c]["conv"]
            b = dual[f"b{i}"][c]["conv"]
            m[f"{c}_kernel_a"] = a["kernel"]
            m[f"{c}_kernel_b"] = b["kernel"]
            m[f"{c}_bias_a"] = a["bias"]
            if bias_b:
                m[f"{c}_bias_b"] = b["bias"]
        out[f"m{i}"] = m
    return out


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
