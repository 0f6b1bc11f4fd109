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


def grid_sample(
    feat: jnp.ndarray,   # (B, H, W, C)
    grid: jnp.ndarray,   # (B, N, 2) normalized coords in [-1, 1], (x, y) order
    align_corners: bool = False,
    padding_zero: bool = True,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Grid sample at a set of points — torch F.grid_sample semantics for a
    (B, 1, N, 2)-style grid, returning (B, N, C).  mode ∈ {bilinear, bicubic};
    out-of-range samples read zeros (padding_mode='zeros')."""
    b, h, w, c = feat.shape
    x, y = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (w - 1)
        fy = (y + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((x + 1.0) * w - 1.0) * 0.5
        fy = ((y + 1.0) * h - 1.0) * 0.5

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
        wxe = wx[..., None]
        wye = wy[..., None]
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
                row = row + corner(x0 + (i - 1), y0 + (j - 1)) * kx[i][..., None]
            out = out + row * ky[j][..., None]
        return out
    raise ValueError(f"unknown grid_sample mode {mode!r}")


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
