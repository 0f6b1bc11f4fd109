"""Batched affine warping — device-side augmentation primitive.

The reference augments on the host with PIL/torchvision per sample
(BTransform, datasets/dataset.py:105-145; BCP affine aug :546-620).  Here the
same joint random rotation/flip runs *inside the jit train step* on TPU: one
batched inverse-mapped gather, identical parameters across image/mask/edge so
the joint-augmentation contract is preserved.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def _sample_nearest(img: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray, fill: float):
    """img (H, W, C); fx/fy (...,) float source coords → (..., C)."""
    h, w, _ = img.shape
    xi = jnp.round(fx).astype(jnp.int32)
    yi = jnp.round(fy).astype(jnp.int32)
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    vals = img[yi, xi]
    return jnp.where(inb[..., None], vals, fill)


def _sample_bilinear(img: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray, fill: float):
    h, w, _ = img.shape
    x0, y0 = jnp.floor(fx), jnp.floor(fy)
    wx, wy = (fx - x0)[..., None], (fy - y0)[..., None]

    def corner(xc, yc):
        inb = (xc >= 0) & (xc < w) & (yc >= 0) & (yc < h)
        vals = img[jnp.clip(yc, 0, h - 1).astype(jnp.int32),
                   jnp.clip(xc, 0, w - 1).astype(jnp.int32)]
        return jnp.where(inb[..., None], vals, fill)

    top = corner(x0, y0) * (1 - wx) + corner(x0 + 1, y0) * wx
    bot = corner(x0, y0 + 1) * (1 - wx) + corner(x0 + 1, y0 + 1) * wx
    return top * (1 - wy) + bot * wy


def affine_warp(
    imgs: jnp.ndarray,      # (B, H, W, C)
    inv_matrices: jnp.ndarray,  # (B, 2, 3) output→input (inverse) affine maps
    fill: float = 0.0,
    mode: str = "nearest",
) -> jnp.ndarray:
    """Warp each image by its inverse affine map: for each output pixel (x, y),
    source = M @ [x, y, 1].  Matches PIL/torchvision center-based transforms
    when the matrix is built by `rotation_inv_matrix` et al."""
    b, h, w, c = imgs.shape
    ys, xs = jnp.mgrid[0:h, 0:w].astype(imgs.dtype)

    def one(img, m):
        fx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
        fy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
        if mode == "nearest":
            return _sample_nearest(img, fx, fy, fill)
        return _sample_bilinear(img, fx, fy, fill)

    return jax.vmap(one)(imgs, inv_matrices)


def rotation_inv_matrix(angles_deg: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B,) rotation angles → (B, 2, 3) inverse maps about the image center
    (torchvision RandomRotation convention: CCW positive, center = size/2)."""
    theta = -angles_deg * (jnp.pi / 180.0)  # inverse rotation
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    c, s = jnp.cos(theta), jnp.sin(theta)
    # translate(-center) → rotate(-θ) → translate(center)
    m00, m01 = c, -s
    m10, m11 = s, c
    tx = cx - (m00 * cx + m01 * cy)
    ty = cy - (m10 * cx + m11 * cy)
    return jnp.stack(
        [jnp.stack([m00, m01, tx], -1), jnp.stack([m10, m11, ty], -1)], axis=-2
    )


def random_joint_rot_flip(
    rng: jax.Array,
    imgs: jnp.ndarray,
    masks: Tuple[jnp.ndarray, ...],
    max_deg: float = 30.0,
    img_fill: float = 1.0,
    mask_fill: float = 0.0,
):
    """BTransform equivalent (dataset.py:118-144): one shared random rotation
    in ±max_deg (white fill for the image, black for masks) plus shared
    vertical/horizontal flips at p=0.5, applied batched on device."""
    b, h, w, _ = imgs.shape
    r_ang, r_v, r_h = jax.random.split(rng, 3)
    angles = jax.random.uniform(r_ang, (b,), minval=-max_deg, maxval=max_deg)
    inv = rotation_inv_matrix(angles, h, w)
    out_img = affine_warp(imgs, inv, fill=img_fill, mode="nearest")
    out_masks = [affine_warp(m, inv, fill=mask_fill, mode="nearest") for m in masks]
    vflip = jax.random.bernoulli(r_v, 0.5, (b,))
    hflip = jax.random.bernoulli(r_h, 0.5, (b,))

    def do_flips(x):
        x = jnp.where(vflip[:, None, None, None], jnp.flip(x, axis=1), x)
        x = jnp.where(hflip[:, None, None, None], jnp.flip(x, axis=2), x)
        return x

    return do_flips(out_img), tuple(do_flips(m) for m in out_masks)
