"""BP — ellipse parameter + emit-line prediction for "emit"-type bubbles.

Rebuild of reference models/networks_BP.py.  Stage 1 regresses 5 ellipse
params (cx, cy, rx, ry, step) from a conv encoder; stage 2 samples 720 points
on the (detached) predicted ellipse, gathers image features at those points
with ONE batched grid-sample (the reference loops grid_sample per image,
networks_BP.py:202-227), and runs attention towers to predict a per-point
trigger class + 4 line params (offset_x, offset_y, theta, length).

  ContentEndoer          networks_BP.py:19-42   (7-conv stride-8, 256ch)
  EllipseParamPredictor  networks_BP.py:44-66   (avgpool 4x4 → 3 linears;
                         note the conv stack is defined but unused in forward)
  ValueEncoder           networks_BP.py:68-92   (per-point MLP 8→2048, then
                         3 self-attention blocks over the 2048 embedding
                         positions with the 720 points as channels)
  EmitLineParamPredictor networks_BP.py:94-152
  sample_points_ellipse  networks_BP.py:154-174 (→ ops.geometry)
  EmitLinePredictor      networks_BP.py:176-240 (stride-32 conv pyramid to
                         2048ch over the RAW image, grid-sample at ellipse pts)
  ComposeNet             networks_BP.py:242-262 (stage-2 input is
                         stop_gradient(ellipse_params), the .detach().cpu()
                         staging at :256)

Fixed shapes throughout: S = SAMPLE_COUNT = 720 points per image.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from vaeplay_tpu.core.layers import ConvBlock, DenseBlock, SelfAttentionBlock
from vaeplay_tpu.ops.geometry import sample_points_ellipse
from vaeplay_tpu.ops.image import point_sample_ng

SAMPLE_SCALE = 2
SAMPLE_COUNT = int(360 * SAMPLE_SCALE)
VALUE_WEIGHT = 10.0


class ContentEndoer(nn.Module):
    """7-conv encoder, stride 8, 256 channels (networks_BP.py:19-42).  The
    reference's misspelling is kept for API parity."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for i, (c, s) in enumerate(
            [(64, 1), (128, 1), (256, 2), (256, 2), (256, 2), (256, 1), (256, 1)]
        ):
            x = ConvBlock(c, 3, stride=s, name=f"conv{i}")(x, train=train)
        return x


class EllipseParamPredictor(nn.Module):
    """avgpool to 4x4 → 3 linears → (cx, cy, rx, ry, step) at x10 scale
    (networks_BP.py:44-66; the conv stack is dead code in the reference)."""

    in_channels: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # AdaptiveAvgPool2d((4, 4)) for divisible sizes
        x = x.reshape(b, 4, h // 4, 4, w // 4, c).mean(axis=(2, 4))
        x = x.reshape(b, -1)
        x = DenseBlock(self.in_channels * 4, activate=None, name="fc0")(x)
        x = DenseBlock(self.in_channels, activate=None, name="fc1")(x)
        x = DenseBlock(5, activate=None, name="fc2")(x)
        return x


class ValueEncoder(nn.Module):
    """Per-point MLP embed → 3 attention blocks over embedding positions.

    Input (B, S, E); output (B, S, out_channels).  The attention operates on
    an (B, out_channels, 1, S)-NHWC tensor so positions = the out_channels
    embedding dims and channels = the S points, matching the reference's
    NCHW (B, S, out, 1) layout (networks_BP.py:84-92).
    """

    out_channels: int = 2048
    ring: object = None  # ops.attention.RingRouting (CP over embedding dims)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, s, e = x.shape
        y = x.reshape(b * s, e)
        y = DenseBlock(64, activate=None, name="fc0")(y)
        y = DenseBlock(128, activate=None, name="fc1")(y)
        y = DenseBlock(256, activate=None, name="fc2")(y)
        y = DenseBlock(self.out_channels, activate=None, name="fc3")(y)
        y = y.reshape(b, s, self.out_channels)
        # to (B, H=out, W=1, C=S) for position-over-embedding attention
        y = y.transpose(0, 2, 1)[:, :, None, :]
        for i in range(3):
            y = SelfAttentionBlock(ring=self.ring, name=f"attn{i}")(y, train=train)
        return y[:, :, 0, :].transpose(0, 2, 1)  # back to (B, S, out)


class EmitLineParamPredictor(nn.Module):
    """Trigger + line-param heads over ellipse-sampled point features
    (networks_BP.py:94-152)."""

    in_channels: int = 2048
    ring: object = None  # ops.attention.RingRouting

    @nn.compact
    def __call__(self, feat_pts: jnp.ndarray, sample_pts: jnp.ndarray,
                 params: jnp.ndarray, train: bool = True):
        b, s, c = feat_pts.shape
        # embed: [cx, cy, rx, ry] broadcast + on-step indicator + the
        # reference's concat-then-reshape of (dpx, dpy, radian) — which
        # interleaves the three blocks rather than zipping per point
        # (networks_BP.py:133-138); reproduced bit-for-bit.
        # Index math runs f32 (arange/remainder over 720 indices is wrong in
        # bf16 past 256); the finished embed is cast to the feature compute
        # dtype so the amp chain stays bf16 downstream.
        params = params.astype(jnp.float32)
        sample_pts = sample_pts.astype(jnp.float32)
        param_embed = jnp.broadcast_to(params[:, None, :4], (b, s, 4))
        step = jnp.round(params[:, 4:5])
        idx = jnp.broadcast_to(jnp.arange(s, dtype=jnp.float32)[None, :], (b, s))
        # round(step) == 0 (an untrained net's tiny predictions) makes the
        # remainder NaN and the == 0 test FALSE — exactly the reference's
        # torch.remainder(arange, 0) semantics (networks_BP.py:132); a
        # previous where-guard here forced step→1 (every point flagged),
        # a transplant-visible divergence caught by the BP trajectory gate.
        # No gradient flows through the boolean, so the NaN is inert.
        d_embed = (jnp.remainder(idx, step) == 0).astype(jnp.float32)[..., None]
        scrambled = jnp.concatenate(
            [sample_pts[:, :, 2], sample_pts[:, :, 3], sample_pts[:, :, 5]], axis=-1
        ).reshape(b, s, 3)
        embed = jnp.concatenate(
            [param_embed, d_embed, scrambled], axis=-1
        ).astype(feat_pts.dtype)  # (B,S,8)
        known = ValueEncoder(self.in_channels, ring=self.ring,
                             name="value_encoder")(embed, train=train)

        x = feat_pts + known
        # attention towers run with positions = embedding dims (see ValueEncoder)
        def tower(y, prefix):
            y = y.transpose(0, 2, 1)[:, :, None, :]
            for i in range(3):
                y = SelfAttentionBlock(ring=self.ring,
                                       name=f"{prefix}{i}")(y, train=train)
            return y[:, :, 0, :].transpose(0, 2, 1)

        x_a = tower(x, "attn_a")
        x_a = x_a.reshape(b * s, c)
        t = DenseBlock(c, activate="lrelu", name="trig0")(x_a)
        t = DenseBlock(c, activate="lrelu", name="trig1")(t)
        if_trigger = DenseBlock(2, activate=None, name="trig2")(t).reshape(b, s, 2)

        x_b = tower(x, "attn_b")
        x_b = x_b.reshape(b * s, c)
        p = DenseBlock(c, activate="lrelu", name="param0")(x_b)
        p = DenseBlock(c, activate=None, name="param1")(p)
        line = DenseBlock(4, activate=None, name="param2")(p).reshape(b, s, 4)
        return if_trigger, line


class EmitLinePredictor(nn.Module):
    """Conv pyramid over the raw image + batched ellipse-point feature
    gather + param predictor (networks_BP.py:176-240)."""

    image_size: int = 512
    # reference channel pyramid (networks_BP.py:180-188); tests shrink this
    channels: tuple = ((64, 2), (128, 2), (256, 2), (512, 2), (1024, 2), (2048, 1), (2048, 1))
    ring: object = None  # ops.attention.RingRouting

    @nn.compact
    def __call__(self, x: jnp.ndarray, params: jnp.ndarray, train: bool = True):
        for i, (c, s) in enumerate(self.channels):
            x = ConvBlock(c, 3, stride=s, activate="lrelu", name=f"conv{i}")(
                x, train=train
            )
        # params arrive at x10 scale; stage-2 consumes /VALUE_WEIGHT coords
        # (networks_BP.py:233) — kept functional instead of in-place.
        # Coordinate math stays f32 under amp: the per-point sample indices
        # (0..719) and the degree gathers in ellipse_pt_loss are integer-exact
        # only in f32 (bf16 mantissa stops at 256), and before this upcast the
        # f32 trig constants promoted feat_pts + the whole param-predictor
        # chain to f32, erasing the bf16 gain (tools/probe_bp_hlo.py).
        params = params.astype(jnp.float32)
        params = params.at[:, :4].set(params[:, :4] / VALUE_WEIGHT)
        sample_pts = sample_points_ellipse(params, SAMPLE_COUNT, SAMPLE_SCALE)
        # ONE batched bilinear gather at normalized [-1,1] ellipse coords
        # (replaces the per-image grid_sample loop, networks_BP.py:202-227)
        # scatter-free backward; the ellipse-point grid is detached
        # (networks_BP.py:256), so its zero cotangent is exact
        feat_pts = point_sample_ng(x, sample_pts[..., :2], False, "bilinear")
        if_triggers, line_params = EmitLineParamPredictor(
            self.channels[-1][0], ring=self.ring, name="param_predictor"
        )(feat_pts, sample_pts, params, train=train)
        return if_triggers, line_params, sample_pts


class ComposeNet(nn.Module):
    """Full BP pipeline (networks_BP.py:242-262)."""

    image_size: int = 512
    emit_channels: tuple = ((64, 2), (128, 2), (256, 2), (512, 2), (1024, 2), (2048, 1), (2048, 1))
    ring: object = None  # ops.attention.RingRouting for the attention towers

    def setup(self):
        self.encoder = ContentEndoer()
        self.ellipse_predictor = EllipseParamPredictor()
        self.emit_line_predictor = EmitLinePredictor(
            image_size=self.image_size, channels=self.emit_channels,
            ring=self.ring,
        )

    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        ellipse_params = self.ellipse_predictor(self.encoder(x, train=train))
        # stage-2 sees detached stage-1 outputs (networks_BP.py:256)
        if_triggers, line_params, sample_pts = self.emit_line_predictor(
            x, jax.lax.stop_gradient(ellipse_params), train=train
        )
        return {
            "ellipse_params": ellipse_params,
            "if_triggers": if_triggers,
            "line_params": line_params,
            "sample_infos": sample_pts,
        }

    def emit_line_only(self, x: jnp.ndarray, params: jnp.ndarray, train: bool = True):
        """The teacher-forced stage-2 pass (train_BP.py:86-99): runs the emit
        line predictor with ground-truth ellipse params (x10 scale)."""
        if_triggers, line_params, sample_pts = self.emit_line_predictor(
            x, params, train=train
        )
        return {
            "if_triggers": if_triggers,
            "line_params": line_params,
            "sample_infos": sample_pts,
        }
