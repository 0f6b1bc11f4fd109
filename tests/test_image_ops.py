"""Image-op parity tests: grid_sample vs torch.nn.functional.grid_sample,
pooling vs torch, affine-warp self-consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.ops.image import (
    avg_pool, grid_sample, max_pool, point_sample_ng, resize_bilinear)
from vaeplay_tpu.ops.warp import affine_warp, random_joint_rot_flip, rotation_inv_matrix

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(mode, align_corners):
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(2, 9, 11, 5)).astype(np.float32)
    # points both inside and outside [-1, 1] (zeros padding)
    grid = rng.uniform(-1.3, 1.3, size=(2, 17, 2)).astype(np.float32)

    got = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(grid),
                                 align_corners=align_corners, mode=mode))
    tfeat = torch.from_numpy(feat.transpose(0, 3, 1, 2).copy())
    tgrid = torch.from_numpy(grid[:, None, :, :].copy())  # (B, 1, N, 2)
    exp = F.grid_sample(tfeat, tgrid, mode=mode, align_corners=align_corners,
                        padding_mode="zeros")
    exp = exp[:, :, 0, :].permute(0, 2, 1).numpy()  # (B, N, C)
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_pooling_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    np.testing.assert_allclose(
        np.asarray(avg_pool(jnp.asarray(x), 2)),
        F.avg_pool2d(tx, 2).numpy().transpose(0, 2, 3, 1), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(max_pool(jnp.asarray(x), 3, stride=2, padding=1)),
        F.max_pool2d(tx, 3, stride=2, padding=1).numpy().transpose(0, 2, 3, 1),
        atol=1e-6)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 7, 9, 2)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (14, 18)))
    exp = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
                        size=(14, 18), mode="bilinear").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_affine_warp_rotation_roundtrip():
    """Rotating by theta then -theta recovers the interior of the image."""
    # smooth image: bilinear roundtrip error stays small only for
    # low-frequency content
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32.0
    x = (0.5 + 0.3 * np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy))[None, :, :, None]
    ang = jnp.asarray([23.0])
    fwd = affine_warp(jnp.asarray(x), rotation_inv_matrix(ang, 32, 32),
                      fill=0.0, mode="bilinear")
    back = affine_warp(fwd, rotation_inv_matrix(-ang, 32, 32),
                       fill=0.0, mode="bilinear")
    center = np.s_[:, 10:22, 10:22, :]
    np.testing.assert_allclose(np.asarray(back)[center], x[center], atol=0.15)


def test_joint_rot_flip_preserves_correspondence():
    """Image and masks receive the identical transform (the BTransform
    joint-seed contract, dataset.py:133-141)."""
    x = np.zeros((4, 32, 32, 3), np.float32)
    m = np.zeros((4, 32, 32, 1), np.float32)
    x[:, 8:12, 20:26] = 1.0
    m[:, 8:12, 20:26] = 1.0
    out_img, (out_m,) = random_joint_rot_flip(
        jax.random.PRNGKey(0), jnp.asarray(x), (jnp.asarray(m),),
        img_fill=0.0, mask_fill=0.0)
    np.testing.assert_allclose(np.asarray(out_img)[..., 0], np.asarray(out_m)[..., 0],
                               atol=1e-6)
    assert float(jnp.sum(out_m)) > 0  # the blob survived the warp


@pytest.mark.parametrize("mode,align", [("bilinear", False), ("bicubic", True),
                                        ("bilinear", True), ("bicubic", False)])
def test_point_sample_ng_matches_grid_sample(mode, align):
    """Forward is bit-identical to grid_sample; grad wrt the feature map from
    the dense matmul backward matches the gather op's scatter-add autodiff
    (including out-of-bounds points, which read/backprop zeros)."""
    rng = np.random.default_rng(7)
    feat = jnp.asarray(rng.normal(size=(3, 9, 11, 5)).astype(np.float32))
    grid = jnp.asarray(
        rng.uniform(-1.4, 1.4, size=(3, 17, 2)).astype(np.float32))  # some OOB
    cot = jnp.asarray(rng.normal(size=(3, 17, 5)).astype(np.float32))

    out_ref = grid_sample(feat, grid, align_corners=align, mode=mode)
    out_new = point_sample_ng(feat, grid, align, mode)
    np.testing.assert_array_equal(np.asarray(out_new), np.asarray(out_ref))

    g_ref = jax.grad(
        lambda f: jnp.sum(grid_sample(f, grid, align_corners=align, mode=mode) * cot)
    )(feat)
    g_new = jax.grad(
        lambda f: jnp.sum(point_sample_ng(f, grid, align, mode) * cot)
    )(feat)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_point_sample_ng_bwd_keeps_primal_dtype():
    """Under bf16 amp the feature map and the incoming cotangent can have
    different dtypes; the returned grad must carry the PRIMAL feature dtype
    (JAX asserts this — caught live in the BC bf16 train step)."""
    from vaeplay_tpu.ops.image import _point_sample_ng_bwd, _point_sample_ng_fwd

    rng = np.random.default_rng(9)
    feat = jnp.asarray(rng.normal(size=(2, 6, 6, 3)), dtype=jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(2, 5, 2)).astype(np.float32))
    out, res = _point_sample_ng_fwd(feat, grid, False, "bilinear")
    g32 = jnp.ones(out.shape, jnp.float32)          # f32 cotangent, bf16 primal
    grad_feat, grad_grid = _point_sample_ng_bwd(False, "bilinear", res, g32)
    assert grad_feat.dtype == feat.dtype
    assert grad_grid.dtype == grid.dtype


def test_point_sample_ng_grid_cotangent_is_zero():
    """The grid is declared non-differentiable (all call sites detach it)."""
    rng = np.random.default_rng(8)
    feat = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(2, 5, 2)).astype(np.float32))
    g = jax.grad(
        lambda gr: jnp.sum(point_sample_ng(feat, gr, False, "bilinear") ** 2)
    )(grid)
    np.testing.assert_array_equal(np.asarray(g), np.zeros_like(np.asarray(g)))
