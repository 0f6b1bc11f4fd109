"""BC — contour extraction + refinement (PolyTransform-style).

Rebuild of reference models/networks_BC.py.  The reference's architectural
hot spot — a per-image CPU marching-squares call in the middle of `forward`
(find_tensor_contour, networks_BC.py:217) — becomes a `jax.pure_callback`
into the native C++ contour tracer, so the whole train step stays ONE jit
program: XLA runs the conv stages on TPU, the callback hops to the host for
the (non-differentiable) contour trace, and the refine stage resumes on TPU
with fixed-capacity (max_points, mask) point sets.

  find_tensor_contour  networks_BC.py:26-36  → ops.contour.batch_find_contours
  resample_feature     networks_BC.py:55-78  → one batched bicubic grid-sample
                        (reference loops per image); the reference normalizes
                        full-resolution contour coords by the stride-4 feature
                        map's half-extent — reproduced as-is
  FeatureNet           networks_BC.py:80-93  (resnet50-FPN level "0")
  MaskNet              networks_BC.py:95-129 (3+2 conv groups with 2x bilinear
                        upsamples, 2-conv predictor)
  EdgeNet              networks_BC.py:131-147 (5 convs ON the 1-ch mask logits)
  RefineNet            networks_BC.py:149-176 (6 self-attention blocks over the
                        point-feature matrix + 2-layer FC → per-point (dx, dy);
                        CASE=1 layout: channels = points)
  ComposeNet           networks_BC.py:178-241
"""

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vaeplay_tpu.core.layers import (
    ConvBlock, SelfAttentionBlock, SmallChannelConv3x3S1, add_coords,
    depth_to_space, space_to_depth, upsample2x_bilinear)
from vaeplay_tpu.models.backbone import ResNetFPN
from vaeplay_tpu.ops.contour import batch_find_contours
from vaeplay_tpu.ops.image import point_sample_ng

DEFAULT_MAX_POINTS = 256


class FeatureNet(nn.Module):
    # slim variants (see backbone.ResNet50) for dryrun/SPMD-structure tests
    backbone_layers: tuple = (3, 4, 6, 3)
    backbone_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        return ResNetFPN(layers=self.backbone_layers,
                         base_width=self.backbone_width, name="feature")(x)["0"]


class MaskNet(nn.Module):
    in_channel: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = self.in_channel
        x = ConvBlock(c // 2, 3, bn="batch", name="c1a")(x, train=train)
        x = ConvBlock(c // 4, 3, bn="batch", name="c1b")(x, train=train)
        x = ConvBlock(c // 8, 3, bn="batch", name="c1c")(x, train=train)
        x = upsample2x_bilinear(x)
        x = ConvBlock(c // 16, 3, bn="batch", name="c2a")(x, train=train)
        x = ConvBlock(c // 32, 3, bn="batch", name="c2b")(x, train=train)
        x = upsample2x_bilinear(x)
        # full-res 4→1-channel predictor tail in the space-to-depth(4) domain
        # (exact same math, no 128-lane channel padding — see
        # core/layers.SmallChannelConv3x3S1)
        z = space_to_depth(x, 4)
        z = SmallChannelConv3x3S1(c // 64, block=4, activate=None,
                                  name="p1")(z, train=train)
        z = SmallChannelConv3x3S1(1, block=4, activate=None,
                                  name="p2")(z, train=train)
        return depth_to_space(z, 4)


class OneChannelConv3x3(nn.Module):
    """Learned 1→1-channel 3x3 conv computed as 9 shifted multiplies on the
    squeezed (B, H, W) map — same kernel/bias parameters and exact values as
    the plain conv, but without the 128x lane padding TPU applies to
    C=1 convs at full resolution."""

    activate: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        from vaeplay_tpu.core import init as vinit
        from vaeplay_tpu.core.layers import apply_activation

        k = self.param("kernel", vinit.conv_kaiming, (3, 3, 1, 1))
        bias = self.param("bias", vinit.zeros, (1,))
        y = x[..., 0]
        h, w = y.shape[1], y.shape[2]
        p = jnp.pad(y, ((0, 0), (1, 1), (1, 1)))
        out = bias[0]
        for dy in range(3):
            for dx in range(3):
                out = out + k[dy, dx, 0, 0] * p[:, dy:dy + h, dx:dx + w]
        return apply_activation(out[..., None], self.activate, lrelu_slope=0.02)


class EdgeNet(nn.Module):
    """Operates on the 1-channel mask logits (networks_BC.py:131-147)."""

    in_channel: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for i in range(3):
            x = OneChannelConv3x3(name=f"c{i}")(x, train=train)
        x = OneChannelConv3x3(activate=None, name="p0")(x, train=train)
        x = OneChannelConv3x3(activate=None, name="p1")(x, train=train)
        return x


class RefineNet(nn.Module):
    """6 attention blocks over (channels=points, positions=feature dims) + FC
    head → per-point (dx, dy) (networks_BC.py:149-176, CASE=1).

    fc_dtype: dtype of the two FC kernels and their matmuls.  The reference's
    256-point working set makes fc0 a (66048, 8256) kernel — 545M params; in
    f32 its Adam state alone exceeds a single v5e chip's HBM, so the TPU
    working point stores and computes these two kernels in bfloat16 (outputs
    cast back to f32; attention stack and losses stay f32).  Parity budget is
    gated by tests/test_bc.py::test_refine_fc_bf16_parity."""

    max_points: int = DEFAULT_MAX_POINTS
    feat_size: int = 258  # backbone channels + 2 coord channels
    fc_dtype: str = "float32"
    ring: Optional[object] = None  # ops.attention.RingRouting

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, p, f = x.shape  # (B, max_points, feat)
        # torch layout (B, C=points, HW=feat, 1) → NHWC (B, feat, 1, points)
        y = x.transpose(0, 2, 1)[:, :, None, :]
        for i in range(6):
            y = SelfAttentionBlock(ring=self.ring, name=f"attn{i}")(y, train=train)
        y = y[:, :, 0, :].transpose(0, 2, 1).reshape(b, p * f)
        fc_in = self.max_points * self.feat_size
        dt = jnp.dtype(self.fc_dtype)
        dense = lambda feats, name: nn.Dense(
            feats, kernel_init=nn.initializers.variance_scaling(
                1 / 3, "fan_in", "uniform"),
            dtype=dt, param_dtype=dt, name=name)
        y = dense(fc_in // 8, "fc0")(y.astype(dt))
        y = dense(self.max_points * 2, "fc1")(y)
        return y.reshape(b, p, 2).astype(x.dtype)


def host_contours(mask_probs: jnp.ndarray, max_points: int):
    """pure_callback bridge to the native contour tracer.  mask_probs
    (B, H, W, 1) sigmoid values (already padded); returns pts (B, max_points,
    2) float32 and counts (B,) int32, gradients stopped (the reference
    detaches, networks_BC.py:29)."""
    b = mask_probs.shape[0]

    def cb(m):
        pts, counts = batch_find_contours(
            np.asarray(m)[..., 0], max_points=max_points, threshold=0.5
        )
        return pts.astype(np.float32), counts.astype(np.int32)

    out_shape = (
        jax.ShapeDtypeStruct((b, max_points, 2), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    pts, counts = jax.pure_callback(
        cb, out_shape, jax.lax.stop_gradient(mask_probs)
    )
    return pts, counts


def make_embedding_tensor(
    pts: jnp.ndarray,     # (B, max_points, 2) [x, y] int-valued coords
    counts: jnp.ndarray,  # (B,)
    height: int, width: int,
) -> jnp.ndarray:
    """One-hot per-point spatial embedding planes — the reference's unused
    CASE 2 pathway (make_embeding_tensor, networks_BC.py:39-52), provided for
    API completeness: returns (B, max_points, H, W) with a 1 at each valid
    point's (y, x)."""
    b, mp, _ = pts.shape
    xs = jnp.clip(pts[..., 0].astype(jnp.int32), 0, width - 1)
    ys = jnp.clip(pts[..., 1].astype(jnp.int32), 0, height - 1)
    valid = (jnp.arange(mp)[None, :] < counts[:, None])
    flat = ys * width + xs
    planes = jax.nn.one_hot(flat, height * width, dtype=jnp.float32)
    planes = planes * valid[..., None]
    return planes.reshape(b, mp, height, width)


def resample_feature_batched(
    feature: jnp.ndarray,  # (B, Hf, Wf, C) padded + coord-augmented
    pts: jnp.ndarray,      # (B, max_points, 2) [x, y] in *full-res* coords
    counts: jnp.ndarray,   # (B,)
) -> jnp.ndarray:
    """resample_feature (networks_BC.py:55-78) as one batched bicubic gather.
    Normalization uses the feature map's own half-extent on the raw contour
    coords — the reference's coordinate convention, kept verbatim."""
    b, hf, wf, c = feature.shape
    w_half = (wf - 1) / 2.0
    h_half = (hf - 1) / 2.0
    gx = (pts[..., 0] - w_half) / w_half
    gy = (pts[..., 1] - h_half) / h_half
    grid = jnp.stack([gx, gy], axis=-1)
    # point_sample_ng: identical bicubic gather forward, but the backward
    # builds grad_feature with dense matmuls instead of 16 scatter-adds (the
    # contour grid is non-differentiable — host-traced, networks_BC.py:29).
    # Explicit f32: grid_sample now returns the FEATURE dtype (ops/image.py
    # dtype contract), but BC's point path deliberately keeps the attention
    # stack + losses in f32 under amp (only the two RefineNet FCs run bf16 —
    # see RefineNet docstring), so upcast at the boundary.
    # align_corners=False: the reference's grid_sample call leaves the torch
    # default (networks_BC.py:68) even though its (w-1)/2 normalization reads
    # like the align_corners=True convention — caught by
    # tests/test_parity_trajectory_bc.py::test_transplant_forward_parity.
    sampled = point_sample_ng(feature, grid, False, "bicubic").astype(jnp.float32)
    valid = (jnp.arange(pts.shape[1])[None, :] < counts[:, None])
    return sampled * valid[..., None].astype(sampled.dtype)


def pack_mask_bits(binary: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) {0,1} uint8 → (B, H, ceil(W/8)) uint8, np.unpackbits layout."""
    b, h, w = binary.shape
    pad_w = (-w) % 8
    if pad_w:
        binary = jnp.pad(binary, ((0, 0), (0, 0), (0, pad_w)))
    bits = binary.reshape(b, h, -1, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


class ComposeNet(nn.Module):
    """Two contour-bridge modes:

    * callback (default, platforms with host-callback support): the contour
      trace runs as a pure_callback INSIDE the jit program — single program
      per step.
    * external (axon runtime, which rejects host callbacks): the caller runs
      `mask_probs` first, traces contours on the host, and passes
      `contours=(pts, counts)` back into the full forward.  Same math, two
      programs + one host hop per step.
    """

    padding: int = 1
    max_points: int = DEFAULT_MAX_POINTS
    refine_fc_dtype: str = "float32"
    backbone_layers: tuple = (3, 4, 6, 3)
    backbone_width: int = 64
    ring: Optional[object] = None  # ops.attention.RingRouting for RefineNet

    def setup(self):
        self.feature_net = FeatureNet(backbone_layers=self.backbone_layers,
                                      backbone_width=self.backbone_width)
        self.mask_net = MaskNet()
        self.edge_net = EdgeNet()
        # feat_size = backbone out_channels (256) + 2 coord channels
        self.refine_net = RefineNet(max_points=self.max_points, feat_size=258,
                                    fc_dtype=self.refine_fc_dtype,
                                    ring=self.ring)

    def __call__(
        self, x: jnp.ndarray, train: bool = True, contours=None
    ) -> Dict[str, jnp.ndarray]:
        p = self.padding
        feature = self.feature_net(x, train=train)
        mask_out = self.mask_net(feature, train=train)
        edge_out = self.edge_net(mask_out, train=train)
        if contours is None:
            padded_mask = jnp.pad(
                jax.nn.sigmoid(mask_out), ((0, 0), (p, p), (p, p), (0, 0))
            )
            pts, counts = host_contours(padded_mask, self.max_points)
        else:
            pts, counts = contours
        feature_p = jnp.pad(feature, ((0, 0), (p, p), (p, p), (0, 0)))
        feature_p = add_coords(feature_p)
        feature_embed = resample_feature_batched(feature_p, pts, counts)
        regressions = self.refine_net(feature_embed, train=train)
        return {
            "edges": edge_out,
            "masks": mask_out,
            "contours": pts,
            "contour_counts": counts,
            "contour_regressions": regressions,
        }

    def mask_probs(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """Stage A for external-contour mode: padded sigmoid mask probs."""
        p = self.padding
        feature = self.feature_net(x, train=train)
        mask_out = self.mask_net(feature, train=train)
        return jnp.pad(jax.nn.sigmoid(mask_out), ((0, 0), (p, p), (p, p), (0, 0)))

    def mask_binary(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """Stage A returning the padded 0.5-thresholded mask as uint8 —
        4x less device→host traffic for the external-contour bridge (the
        tunnel transfer dominates the bridge cost)."""
        return (self.mask_probs(x, train=train) >= 0.5).astype(jnp.uint8)

    def mask_bits(self, x: jnp.ndarray, train: bool = True,
                  stride: int = 1) -> jnp.ndarray:
        """Stage A returning the thresholded mask BIT-PACKED along the width
        axis (np.unpackbits-compatible, 32x less transfer than f32): output
        (B, Hp/stride, ceil(Wp/stride/8)) uint8.

        stride > 1 subsamples the thresholded mask before packing — stride 4
        cuts the bridge transfer and the host marching-squares cost ~16x;
        the host scales traced coords back by `stride` (points quantize to
        `stride` px, which the refine head's regression targets absorb)."""
        binary = self.mask_binary(x, train=train)[..., 0]  # (B, Hp, Wp)
        if stride > 1:
            binary = binary[:, ::stride, ::stride]
        return pack_mask_bits(binary)
