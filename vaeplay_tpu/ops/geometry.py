"""Geometry utilities — TPU-native rebuild of reference tools/utils.py geometry
helpers plus the closed-form ellipse sampler from networks_BP.

Everything here is vectorized jnp (no per-image python loops): circle
rendering is a broadcasted distance test, ellipse sampling is one batched
closed-form evaluation over all sample angles.
"""

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def generate_circle_param(rng: np.random.Generator, n: int, min_radius: int) -> Dict[str, int]:
    """Random circle fully inside an n x n image (reference tools/utils.py:13-22)."""
    half_n = n // 2
    radius = int(rng.integers(low=min_radius, high=half_n - min_radius))
    center_x = radius + int(rng.integers(low=0, high=n - 2 * radius))
    center_y = radius + int(rng.integers(low=0, high=n - 2 * radius))
    return {"radius": radius, "x": center_x, "y": center_y}


def render_circle_batch(
    n: int, radius: jnp.ndarray, center_x: jnp.ndarray, center_y: jnp.ndarray
) -> jnp.ndarray:
    """Batch render filled circles as (B, n, n, 1) float images in [0, 1].

    Vectorized equivalent of tools/utils.py:24-42 + 66-71 (value 255→1.0,
    inside = dist^2 <= r^2).
    """
    coords = jnp.arange(n, dtype=jnp.float32)
    xv = coords[None, None, :] - center_x[:, None, None]
    yv = coords[None, :, None] - center_y[:, None, None]
    inside = (xv**2 + yv**2) <= (radius[:, None, None] ** 2)
    return inside.astype(jnp.float32)[..., None]


def encode_circle_param(n: int, radius, center_x, center_y) -> Dict[str, jnp.ndarray]:
    """log-radius + [-1,1] centers (reference tools/utils.py:44-53)."""
    half = n // 2
    return {
        "radius": jnp.log(radius / n),
        "x": (center_x - half) / half,
        "y": (center_y - half) / half,
    }


def decode_circle_param(n: int, c_radius, c_x, c_y) -> Dict[str, jnp.ndarray]:
    """Inverse of encode_circle_param (reference tools/utils.py:55-64)."""
    half = n // 2
    return {
        "radius": jnp.exp(c_radius) * n,
        "x": c_x * half + half,
        "y": c_y * half + half,
    }


def unit_vector(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def angle_between(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Angle in radians between vectors (reference tools/utils.py:131-143)."""
    u1, u2 = unit_vector(v1), unit_vector(v2)
    return jnp.arccos(jnp.clip(jnp.sum(u1 * u2, axis=-1), -1.0, 1.0))


def rotate_vector(vx, vy, rotation):
    """reference tools/utils.py:145-148."""
    c, s = jnp.cos(rotation), jnp.sin(rotation)
    return vx * c - vy * s, vx * s + vy * c


def sample_points_ellipse(
    ellipse_params: jnp.ndarray,
    sample_count: int = 720,
    sample_scale: float = 2.0,
) -> jnp.ndarray:
    """Sample points + outward unit normals on batched ellipses.

    Vectorized rebuild of networks_BP.py:154-174 (the reference loops per
    image; here one broadcasted evaluation covers the whole batch):
    ellipse_params (B, >=4) = cx, cy, rx, ry[, step] (already /VALUE_WEIGHT).
    Returns (B, S, 6): [px, py, dpx, dpy, sample-index, radian] where
    (dpx, dpy) is the normalized tangent rotated by -pi/2 (the outward
    normal, networks_BP.py:162-171) and sample-index = 0..S-1 is used to
    gather per-sample GT rows (tools/ops.py:100-102).
    """
    b = ellipse_params.shape[0]
    cx, cy, rx, ry = (ellipse_params[:, i] for i in range(4))
    ds = jnp.arange(sample_count, dtype=jnp.float32)
    radians = ds / sample_scale * (math.pi / 180.0)
    cos_t, sin_t = jnp.cos(radians), jnp.sin(radians)
    px = cx[:, None] + rx[:, None] * cos_t[None, :]
    py = cy[:, None] + ry[:, None] * sin_t[None, :]
    # unit tangent (rx*-sin, ry*cos), then rotate by -pi/2 → (dpy, -dpx)
    dpx = rx[:, None] * (-sin_t)[None, :]
    dpy = ry[:, None] * cos_t[None, :]
    norm = jnp.sqrt(dpx**2 + dpy**2)
    dpx, dpy = dpx / norm, dpy / norm
    dpx, dpy = dpy, -dpx
    idx = jnp.broadcast_to(ds[None, :], (b, sample_count))
    rad = jnp.broadcast_to(radians[None, :], (b, sample_count))
    return jnp.stack([px, py, dpx, dpy, idx, rad], axis=-1)
