"""Shared layer library (L1) — TPU-native rebuild of reference models/blocks.py.

Conventions (deliberately different from the torch reference):
  * NHWC activations / HWIO kernels everywhere — XLA's native TPU conv layout.
  * flax.linen modules; batch-norm state lives in the `batch_stats` collection
    and `train: bool` is threaded through `__call__`.
  * Under pjit data-parallel sharding, batch-norm reductions become global
    (sync-BN) automatically — reductions over the batch axis are compiled to
    ICI collectives by XLA.

Reference semantics reproduced (citations into /root/reference):
  ConvBlock            models/blocks.py:5-34   (pad=(k-1)//2, bias iff no norm,
                                                relu / lrelu(0.02) / tanh)
  DenseBlock           models/blocks.py:36-50  (lrelu slope 0.2)
  SCSEBlock            models/blocks.py:52-65
  SelfAttentionBlock   models/blocks.py:67-95  (SAGAN; q/k/v are 1x1 ConvBlocks
                                                with default ReLU, learned gamma=0)
  AddCoords            models/blocks.py:97-112
  Down                 models/blocks.py:114-127
  Up                   models/blocks.py:129-146 (2x [conv3x3+BN+relu], bilinear x2)
"""

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from vaeplay_tpu.core import init as vinit
from vaeplay_tpu.ops.attention import spatial_self_attention


def apply_activation(x: jnp.ndarray, activate: Optional[str], lrelu_slope: float):
    if activate is None:
        return x
    if activate == "relu":
        return nn.relu(x)
    if activate == "lrelu":
        return nn.leaky_relu(x, negative_slope=lrelu_slope)
    if activate == "tanh":
        return nn.tanh(x)
    if activate == "sigmoid":
        return nn.sigmoid(x)
    raise ValueError(f"unknown activation {activate!r}")


class ConvBlock(nn.Module):
    """conv(k, stride, pad=(k-1)//2) [+ batch/instance norm] [+ activation].

    Matches reference models/blocks.py:5-34: bias only when there is no norm;
    LeakyReLU slope 0.02; torch BN defaults (eps 1e-5, momentum 0.1 → flax 0.9);
    torch InstanceNorm2d defaults (no affine).
    """

    features: int
    kernel_size: int
    stride: int = 1
    bn: Optional[str] = None  # None | "batch" | "instance"
    activate: Optional[str] = "relu"
    bn_momentum: float = 0.9  # flax convention: running = m*running + (1-m)*batch
    lrelu_slope: float = 0.02
    kernel_init: nn.initializers.Initializer = vinit.conv_kaiming

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.bn is None,
            kernel_init=self.kernel_init,
            bias_init=vinit.zeros,
            name="conv",
        )(x)
        if self.bn == "batch":
            # .astype: flax norms compute/return f32; cast back so a bf16
            # mixed-precision chain stays bf16 downstream (utils/amp.py)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
                name="norm",
            )(x).astype(x.dtype)
        elif self.bn == "instance":
            # torch InstanceNorm2d default: affine=False, track_running_stats=False
            x = nn.GroupNorm(
                num_groups=None,
                group_size=1,
                epsilon=1e-5,
                use_bias=False,
                use_scale=False,
                name="norm",
            )(x).astype(x.dtype)
        elif self.bn is not None:
            raise ValueError(f"unknown norm {self.bn!r}")
        return apply_activation(x, self.activate, self.lrelu_slope)


class ConvTransposeBlock(nn.Module):
    """Torch-semantics ConvTranspose2d(k, stride, padding, output_padding).

    Implemented as an input-dilated conv with explicit padding
    (k-1-p, k-1-p+op) so output sizes and values match torch exactly:
    out = (in-1)*s - 2p + k + op.  Used by the VAE decoder
    (reference models/networks.py:34-46) and Style_GAN's StyleUp.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: Optional[int] = None  # default (k-1)//2, torch-style
    output_padding: int = 1
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = vinit.transpose_conv_kaiming

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s = self.kernel_size, self.stride
        p = (k - 1) // 2 if self.padding is None else self.padding
        op = self.output_padding
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features)
        )
        lo, hi = k - 1 - p, k - 1 - p + op
        # flax-style dtype promotion: mixed input/param dtypes (e.g. a stray
        # f32 activation meeting bf16 amp params) compute in the promoted type
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        x, kernel = x.astype(dt), kernel.astype(dt)
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", vinit.zeros, (self.features,))
            y = y + bias
        return y


class SmallChannelConv3x3S2(nn.Module):
    """3x3 stride-2 conv for inputs with very few channels, computed as a
    2x2 conv over a space-to-depth(2) transform — numerically identical to
    the plain conv (same canonical (3,3,C,F) kernel parameter, zero taps for
    out-of-window positions) but with 4C channels on the TPU lane axis.

    Rationale: TPU convs put channels on the 128-lane axis, so C∈{1,2} convs
    at high resolution (and especially their input gradients, which the GAN
    generator phase needs) are lane-padded up to 128x.  Measured on the
    BE_GAN 512px discriminator stem this turns a ~150 ms input-grad path
    into ~3 ms with bit-equal outputs.
    """

    features: int
    activate: Optional[str] = "lrelu"
    lrelu_slope: float = 0.02
    kernel_init: nn.initializers.Initializer = vinit.conv_kaiming

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        f = self.features
        k = self.param("kernel", self.kernel_init, (3, 3, c, f))
        bias = self.param("bias", vinit.zeros, (f,))
        # expanded kernel w2[bi, bj, oy, ox, c, f] = k[2bi+oy-1, 2bj+ox-1, c, f]
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # index -1 → zero tap
        rows = jnp.stack(
            [jnp.stack([kp[2 * bi + oy] for oy in range(2)]) for bi in range(2)]
        )  # (2(bi), 2(oy), 4(dx+1), c, f)
        w2 = jnp.stack(
            [jnp.stack([rows[:, :, 2 * bj + ox] for ox in range(2)], axis=2)
             for bj in range(2)], axis=1
        )  # (2(bi), 2(bj), 2(oy), 2(ox), c, f)
        w2 = w2.transpose(0, 1, 2, 3, 4, 5).reshape(2, 2, 4 * c, f)
        # space-to-depth(2) with channel order (oy, ox, c)
        x4 = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x4 = x4.reshape(b, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            x4, w2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        return apply_activation(y, self.activate, self.lrelu_slope)


def space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/s, W/s, s²C), channel order (py, px, c)."""
    b, h, w, c = x.shape
    assert h % s == 0 and w % s == 0, (h, w, s)
    x = x.reshape(b, h // s, s, w // s, s, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, s * s * c)


def depth_to_space(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Inverse of space_to_depth: (B, Hb, Wb, s²C) → (B, s·Hb, s·Wb, C)."""
    b, hb, wb, cc = x.shape
    c = cc // (s * s)
    x = x.reshape(b, hb, wb, s, s, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hb * s, wb * s, c)


class SmallChannelConv3x3S1(nn.Module):
    """3x3 *stride-1* conv for very-few-channel full-resolution maps, computed
    in the space-to-depth(s) domain — numerically identical to the plain conv
    (same canonical (3, 3, C, F) kernel parameter; out-of-subpixel taps are
    exact zeros) but with s²C / s²F channels on the TPU's 128-lane axis.

    Rationale: TPU convs and their gradients put channels on the lane axis, so
    the reference's 1-8-channel 3x3 predictor tails at 512² (MaskNet pred1-3,
    networks_BE.py:54-58) are lane-padded up to 128/C×.  Measured on the BE
    head tail (bs32, 512px, bf16): 15.4 ms → ~2 ms for three convs whose
    arithmetic is <1 GFLOP.

    Input and output stay in the s2d domain ((B, H/s, W/s, s²C), channel
    order (py, px, c) matching `space_to_depth`), so a chain of these convs
    pays the layout transpose once at each end:

        z = space_to_depth(x, 4)
        z = SmallChannelConv3x3S1(8, block=4, ...)(z)
        z = SmallChannelConv3x3S1(1, block=4, ...)(z)
        y = depth_to_space(z, 4)

    kernel_size may be any odd k with k//2 <= block (3x3 and the reference's
    5x5 stems both qualify at block=4) — taps then reach at most one
    neighboring block, so the block-space conv extent stays 3.
    """

    features: int
    block: int = 4
    kernel_size: int = 3
    activate: Optional[str] = "relu"
    lrelu_slope: float = 0.02
    kernel_init: nn.initializers.Initializer = vinit.conv_kaiming

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        s, ks = self.block, self.kernel_size
        half = ks // 2
        assert ks % 2 == 1 and half <= s, (ks, s)
        c = z.shape[-1] // (s * s)
        assert z.shape[-1] == s * s * c, (z.shape, s)
        f = self.features
        k = self.param("kernel", self.kernel_init, (ks, ks, c, f))
        bias = self.param("bias", vinit.zeros, (f,))
        # Expanded block-space kernel: output subpixel (oy, ox)'s kxk taps at
        # absolute offsets (oy+r-half, ox+t-half) land in neighbor block
        # (di-1, dj-1) at subpixel (py, px).  All other entries are exact
        # zeros.  The placement map is STATIC, so it is materialized as a
        # constant 0/1 selector contracted with the canonical kernel in one
        # einsum — building it with s²·k² scatter updates instead (the
        # previous formulation) made XLA's scatter/gather chains dominate
        # whole-model compile time (~90 s per head on XLA:CPU).
        import numpy as _np

        sel = _np.zeros((3, 3, s, s, s, s, ks, ks), _np.float32)
        for oy in range(s):
            for ox in range(s):
                for r in range(ks):
                    for t in range(ks):
                        di, py = divmod(oy + r - half + s, s)
                        dj, px = divmod(ox + t - half + s, s)
                        sel[di, dj, py, px, oy, ox, r, t] = 1.0
        # sel axes (di, dj, py, px, oy, ox, r, t) × kernel (r, t, c, f)
        # → w axes (di, dj, py, px, c, oy, ox, f)
        w = jnp.einsum("ijpqyxrt,rtcf->ijpqcyxf",
                       jnp.asarray(sel, k.dtype), k)
        w = w.reshape(3, 3, s * s * c, s * s * f)
        dt = jnp.promote_types(z.dtype, k.dtype)
        y = jax.lax.conv_general_dilated(
            z.astype(dt), w.astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.tile(bias, s * s).astype(dt)
        return apply_activation(y, self.activate, self.lrelu_slope)


class DenseBlock(nn.Module):
    """linear [+ activation]; LeakyReLU slope 0.2 (reference blocks.py:36-50)."""

    features: int
    use_bias: bool = True
    activate: Optional[str] = "relu"
    kernel_init: nn.initializers.Initializer = vinit.dense_kaiming

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=vinit.zeros,
            name="fc",
        )(x)
        return apply_activation(x, self.activate, lrelu_slope=0.2)


class SCSEBlock(nn.Module):
    """Concurrent spatial & channel squeeze-excite (reference blocks.py:52-65)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # channel SE: global avg pool → 1x1 conv bottleneck → sigmoid gate
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(c // self.reduction, (1, 1), kernel_init=vinit.conv_kaiming,
                     bias_init=vinit.zeros, name="cse_reduce")(se)
        se = nn.relu(se)
        se = nn.Conv(c, (1, 1), kernel_init=vinit.conv_kaiming,
                     bias_init=vinit.zeros, name="cse_expand")(se)
        cse = nn.sigmoid(se)
        # spatial SE: 1x1 conv to a single sigmoid map
        sse = nn.Conv(1, (1, 1), kernel_init=vinit.conv_kaiming,
                      bias_init=vinit.zeros, name="sse")(x)
        sse = nn.sigmoid(sse)
        return x * cse + x * sse


class SelfAttentionBlock(nn.Module):
    """SAGAN-style spatial self-attention (reference blocks.py:67-95).

    q/k/v are 1x1 ConvBlocks *with the default ReLU* (the reference passes
    `Conv2d(c, c//8, 1)` whose default activate='relu'); the attention output
    is scaled by a learned scalar gamma initialised to 0 and added residually.
    The O(N^2) bmm pair runs through ops.attention.spatial_self_attention,
    which dispatches to a Pallas blockwise kernel on TPU.

    `ring`: an optional ops.attention.RingRouting handle — when set (threaded
    down from the owning model's config) and active for this N, the position
    axis shards over the mesh's ring (context parallelism).
    """

    ring: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        q = ConvBlock(max(c // 8, 1), 1, name="q")(x, train=train)
        k = ConvBlock(max(c // 8, 1), 1, name="k")(x, train=train)
        v = ConvBlock(c, 1, name="v")(x, train=train)
        n = h * w
        out = spatial_self_attention(
            q.reshape(b, n, -1), k.reshape(b, n, -1), v.reshape(b, n, c),
            ring=self.ring,
        ).reshape(b, h, w, c)
        gamma = self.param("gamma", vinit.zeros, (1,))
        return gamma * out + x


class PointSelfAttentionBlock(nn.Module):
    """SelfAttentionBlock over a point set (B, N, C) instead of a feature map.

    The reference reuses SelfAttentionBlock on (B, C, N, 1)-shaped tensors for
    contour/ellipse point features (networks_BCP.py:80-84, networks_BP.py:84-88);
    this is the same computation expressed natively on (B, N, C).

    `ring`: optional ops.attention.RingRouting — shards the point axis over
    the mesh ring when active (the repo's context-parallel path).
    """

    ring: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, n, c = x.shape
        x4 = x.reshape(b, n, 1, c)
        q = ConvBlock(max(c // 8, 1), 1, name="q")(x4, train=train).reshape(b, n, -1)
        k = ConvBlock(max(c // 8, 1), 1, name="k")(x4, train=train).reshape(b, n, -1)
        v = ConvBlock(c, 1, name="v")(x4, train=train).reshape(b, n, c)
        out = spatial_self_attention(q, k, v, ring=self.ring)
        gamma = self.param("gamma", vinit.zeros, (1,))
        return gamma * out + x


def add_coords(x: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
    """Append x/y coordinate channels (reference blocks.py:97-112).

    Channel order matches the reference: [features, i (along width), j (along
    height)]; unnormalized coords are raw 0..w-1 / 0..h-1 floats, normalized
    coords are (c/size - 0.5)/0.5 ∈ [-1, 1).
    """
    b, h, w, _ = x.shape
    ii = jnp.broadcast_to(jnp.arange(w, dtype=x.dtype)[None, None, :, None], (b, h, w, 1))
    jj = jnp.broadcast_to(jnp.arange(h, dtype=x.dtype)[None, :, None, None], (b, h, w, 1))
    if normalize:
        ii = (ii / w - 0.5) / 0.5
        jj = (jj / h - 0.5) / 0.5
    return jnp.concatenate([x, ii, jj], axis=-1)


class AddCoords(nn.Module):
    if_normalize: bool = False

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return add_coords(x, normalize=self.if_normalize)


class Down(nn.Module):
    """[AddCoords] + stride-2 ConvBlock (reference blocks.py:114-127)."""

    features: int
    kernel_size: int
    if_add_coord: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.if_add_coord:
            x = add_coords(x)
        return ConvBlock(self.features, self.kernel_size, stride=2, name="conv")(
            x, train=train
        )


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample, torch align_corners=False (half-pixel) semantics."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class Up(nn.Module):
    """[AddCoords] + 2x(conv3x3+BN+relu) + bilinear 2x (reference blocks.py:129-146)."""

    features: int
    if_add_coord: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.if_add_coord:
            x = add_coords(x)
        x = ConvBlock(self.features, 3, bn="batch", name="conv1")(x, train=train)
        x = ConvBlock(self.features, 3, bn="batch", name="conv2")(x, train=train)
        return upsample2x_bilinear(x)
