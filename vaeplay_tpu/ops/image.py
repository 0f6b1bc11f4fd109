"""Image ops: resize wrappers with torch semantics and batched grid-sample.

The reference's per-image `F.grid_sample` python loops (networks_BP.py:202-227,
networks_BC.py:55-78) become one batched gather here — a single fused XLA op
instead of B kernel launches.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize, torch align_corners=False (half-pixel) semantics."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="nearest")


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, C); ix/iy: (N,) int indices (already clipped). → (N, C)"""
    return img[iy, ix]


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Cubic convolution weights for offsets (-1, 0, 1, 2) at fraction t —
    torch grid_sample mode='bicubic' kernel (a = -0.75)."""
    def k(x):
        ax = jnp.abs(x)
        w1 = (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0
        w2 = a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a
        return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))

    return [k(t + 1.0), k(t), k(t - 1.0), k(t - 2.0)]


def _unnormalize_grid(grid: jnp.ndarray, h: int, w: int, align_corners: bool):
    """[-1, 1] grid coords → fractional pixel coords (torch convention)."""
    x, y = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5
    return fx, fy


def grid_sample(
    feat: jnp.ndarray,   # (B, H, W, C)
    grid: jnp.ndarray,   # (B, N, 2) normalized coords in [-1, 1], (x, y) order
    align_corners: bool = False,
    padding_zero: bool = True,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Grid sample at a set of points — torch F.grid_sample semantics for a
    (B, 1, N, 2)-style grid, returning (B, N, C).  mode ∈ {bilinear, bicubic};
    out-of-range samples read zeros (padding_mode='zeros').

    Dtype contract: the output carries the FEATURE dtype (torch returns the
    input dtype too).  Index/weight math always runs in f32 — bf16 pixel
    coordinates are only exact up to 256, and mixing f32 trig-derived grids
    into a bf16 feature chain used to promote every downstream activation to
    f32, silently de-amping whole models (measured +10 ms/phase on BP,
    tools/probe_bp_hlo.py)."""
    b, h, w, c = feat.shape
    fx, fy = _unnormalize_grid(grid.astype(jnp.float32), h, w, align_corners)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def corner(xc, yc):
        inb = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(_gather_2d)(feat, xi, yi)  # (B, N, C)
        if padding_zero:
            vals = vals * inb[..., None].astype(vals.dtype)
        return vals

    if mode == "bilinear":
        v00 = corner(x0, y0)
        v01 = corner(x0 + 1, y0)
        v10 = corner(x0, y0 + 1)
        v11 = corner(x0 + 1, y0 + 1)
        wxe = wx[..., None].astype(feat.dtype)
        wye = wy[..., None].astype(feat.dtype)
        top = v00 * (1 - wxe) + v01 * wxe
        bot = v10 * (1 - wxe) + v11 * wxe
        return top * (1 - wye) + bot * wye
    if mode == "bicubic":
        kx = _cubic_weights(wx)
        ky = _cubic_weights(wy)
        out = 0.0
        for j in range(4):  # y offsets -1..2
            row = 0.0
            for i in range(4):  # x offsets -1..2
                row = row + corner(x0 + (i - 1), y0 + (j - 1)) \
                    * kx[i][..., None].astype(feat.dtype)
            out = out + row * ky[j][..., None].astype(feat.dtype)
        return out
    raise ValueError(f"unknown grid_sample mode {mode!r}")


def _axis_taps(frac: jnp.ndarray, mode: str):
    """Per-axis interpolation tap weights and the integer offset of tap 0
    relative to floor(coord): bilinear = 2 taps at offsets {0, 1}, bicubic =
    4 taps at offsets {-1, 0, 1, 2}."""
    if mode == "bicubic":
        return _cubic_weights(frac), -1
    return [1.0 - frac, frac], 0


def _dense_axis_weights(idx0, taps, base: int, size: int):
    """Dense (B, N, size) interpolation-weight matrix for one axis: row p
    holds each tap's weight at its integer target index, zero elsewhere and
    for out-of-bounds taps (= grid_sample's padding_mode='zeros')."""
    cols = jnp.arange(size, dtype=idx0.dtype)
    out = None
    for j, wgt in enumerate(taps):
        tgt = idx0 + (j + base)
        inb = (tgt >= 0) & (tgt <= size - 1)
        term = jnp.where(inb, wgt, 0.0)[..., None] * (cols == tgt[..., None])
        out = term if out is None else out + term
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def point_sample_ng(feat, grid, align_corners=False, mode="bilinear"):
    """`grid_sample` with a NON-DIFFERENTIABLE grid and a scatter-free
    backward pass.

    The autodiff backward of the gather-based `grid_sample` is taps x
    scatter-adds into the (B, H, W, C) feature map — slow on TPU (serialized
    scatter).  Every model that samples point features does so at detached
    coordinates (BC: host-traced contours, networks_BC.py:29 detaches; BP:
    stage-2 sees detached ellipse params, networks_BP.py:256), so this op
    declares the grid non-differentiable (zero cotangent) and computes
    grad_feat densely:

        grad_feat[b,h,w,c] = sum_n Wy[b,n,h] * Wx[b,n,w] * g[b,n,c]

    where Wy/Wx are the (B, N, size) dense per-axis interpolation-weight
    matrices — one broadcast multiply + one MXU contraction over the point
    axis instead of a scatter.  Worth it when N*H*W is small relative to the
    scatter cost (BC: 256 pts x 130^2 map); for large N x H x W (BCP's 2048
    pts x 128^2) prefer plain `grid_sample`.

    Forward is exactly `grid_sample(feat, grid, align_corners, True, mode)`.
    """
    return grid_sample(feat, grid, align_corners=align_corners, mode=mode)


def _point_sample_ng_fwd(feat, grid, align_corners, mode):
    out = grid_sample(feat, grid, align_corners=align_corners, mode=mode)
    b, h, w, c = feat.shape
    fx, fy = _unnormalize_grid(grid.astype(jnp.float32), h, w, align_corners)
    kx, base = _axis_taps(fx - jnp.floor(fx), mode)
    ky, _ = _axis_taps(fy - jnp.floor(fy), mode)
    wx = _dense_axis_weights(jnp.floor(fx), kx, base, w)
    wy = _dense_axis_weights(jnp.floor(fy), ky, base, h)
    return out, (wy, wx, jnp.zeros_like(grid), jnp.zeros((), feat.dtype))


def _point_sample_ng_bwd(align_corners, mode, res, g):
    wy, wx, grid_zeros, feat_proto = res
    # Factored contraction: (B,N,H,C) intermediate instead of the (B,N,H,W)
    # separable weight volume (which is H/C-times larger and OOMs at BC's
    # 32x256x130x130); the N-contraction lands on the MXU.
    tmp = wy[..., None].astype(g.dtype) * g[:, :, None, :]      # (B, N, H, C)
    grad_feat = jnp.einsum("bnhc,bnw->bhwc", tmp, wx.astype(g.dtype))
    # The cotangent must carry the primal feature dtype (under bf16 amp the
    # feature map and the incoming cotangent can differ).
    return grad_feat.astype(feat_proto.dtype), grid_zeros


point_sample_ng.defvjp(_point_sample_ng_fwd, _point_sample_ng_bwd)


def avg_pool(x: jnp.ndarray, window: int, stride: int = None) -> jnp.ndarray:
    """NHWC average pool (torch AvgPool2d, no padding)."""
    stride = stride or window
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID",
    ) / float(window * window)


def max_pool(x: jnp.ndarray, window: int, stride: int = None, padding: int = 0) -> jnp.ndarray:
    """NHWC max pool (torch MaxPool2d semantics with symmetric int padding)."""
    stride = stride or window
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), pad,
    )
