"""Golden-value tests for the loss library vs the torch reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.ops import losses as L


def test_dice_loss_golden():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(4, 8, 8)).astype(np.float32)
    b = (rng.uniform(size=(4, 8, 8)) > 0.5).astype(np.float32)
    # torch reference (tools/ops.py:12-19)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    iflat, tflat = ta.reshape(4, -1), tb.reshape(4, -1)
    inter = (iflat * tflat).sum(1)
    score = (2 * inter + 1.0) / (iflat.sum(1) + tflat.sum(1) + 1.0)
    expected = float(1 - score.sum() / 4)
    got = float(L.dice_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_bce_with_logits_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16,)).astype(np.float32) * 5
    tgt = (rng.uniform(size=(16,)) > 0.5).astype(np.float32)
    expected = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(tgt), reduction="none"
    ).numpy()
    got = np.asarray(L.sigmoid_bce_with_logits(jnp.asarray(logits), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_smooth_l1_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    a = rng.normal(size=(32,)).astype(np.float32) * 3
    b = rng.normal(size=(32,)).astype(np.float32) * 3
    expected = torch.nn.functional.smooth_l1_loss(
        torch.from_numpy(a), torch.from_numpy(b), reduction="none"
    ).numpy()
    got = np.asarray(L.smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_softmax_ce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(8,))
    expected = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), reduction="none"
    ).numpy()
    got = np.asarray(
        L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_edge_loss_laplacian():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    targets = (rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)
    # torch reference (tools/ops.py:187-214)
    kern = torch.tensor([[-1., -1, -1], [-1, 8, -1], [-1, -1, -1]]) / 8
    conv = torch.nn.Conv2d(1, 1, 3, padding=1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(kern.reshape(1, 1, 3, 3))
    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(targets.transpose(0, 3, 1, 2))
    ge = conv(tt).abs().detach()
    pe = conv(tl).abs().detach()
    iflat, tflat = pe.reshape(2, -1), ge.reshape(2, -1)
    inter = (iflat * tflat).sum(1)
    score = (2 * inter + 1.0) / (iflat.sum(1) + tflat.sum(1) + 1.0)
    expected = float(1 - score.sum() / 2)
    got = float(L.edge_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_chamfer_pt_regression_matches_reference_formula():
    """Compare against a direct (unpadded) numpy port of tools/ops.py:21-66."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    B, N, M, K = 2, 7, 9, 4
    pred = rng.normal(size=(B, N, 2)).astype(np.float32)
    regress = rng.normal(size=(B, N, 2)).astype(np.float32)
    tgt = rng.normal(size=(B, M, 2)).astype(np.float32)
    key = rng.normal(size=(B, K, 2)).astype(np.float32)

    def sub(p, r, t, w_p2t, w_t2p):
        p, r, t = map(torch.from_numpy, (p, r, t))
        n, m = p.shape[0], t.shape[0]
        dif = t.unsqueeze(0).repeat(n, 1, 1) - p.unsqueeze(1).repeat(1, m, 1)
        dist = torch.norm(dif, dim=-1)
        _, p2t = torch.min(dist, dim=1)
        _, t2p = torch.min(dist, dim=0)
        lp = F.mse_loss(r[torch.arange(n)], dif[torch.arange(n), p2t])
        lt = F.mse_loss(r[t2p], dif[t2p, torch.arange(m)])
        return w_p2t * lp + w_t2p * lt

    expected = np.mean(
        [
            float(
                sub(pred[i], regress[i], tgt[i], 1.0, 0.1)
                + sub(pred[i], regress[i], key[i], 0.0, 2.0)
            )
            for i in range(B)
        ]
    )
    ones = lambda *s: jnp.ones(s)
    got = float(
        L.chamfer_pt_regression_loss(
            jnp.asarray(pred), ones(B, N), jnp.asarray(regress),
            jnp.asarray(tgt), ones(B, M), jnp.asarray(key), ones(B, K),
        )
    )
    # fully-valid masks + equal point counts per sample → exact same formula
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_chamfer_padding_invariance():
    """Padding points with mask=0 must not change the loss."""
    rng = np.random.default_rng(6)
    B, N, M, K = 2, 5, 6, 3
    pred = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32))
    regress = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B, M, 2)).astype(np.float32))
    key = jnp.asarray(rng.normal(size=(B, K, 2)).astype(np.float32))
    ones = lambda *s: jnp.ones(s)
    base = L.chamfer_pt_regression_loss(
        pred, ones(B, N), regress, tgt, ones(B, M), key, ones(B, K)
    )
    pad = lambda x, p: jnp.pad(x, ((0, 0), (0, p), (0, 0)), constant_values=77.0)
    padm = lambda m, p: jnp.pad(m, ((0, 0), (0, p)))
    padded = L.chamfer_pt_regression_loss(
        pad(pred, 3), padm(ones(B, N), 3), pad(regress, 3),
        pad(tgt, 4), padm(ones(B, M), 4), pad(key, 2), padm(ones(B, K), 2),
    )
    np.testing.assert_allclose(float(base), float(padded), rtol=1e-5)


def test_vaegan_losses_golden():
    """vaegan_losses vs a direct numpy port of networks.py:264-281."""
    rng = np.random.default_rng(7)
    B, D, Z, P = 3, 16, 8, 3
    x = rng.uniform(size=(B, 4, 4, 1)).astype(np.float32)
    xt = rng.uniform(size=(B, 4, 4, 1)).astype(np.float32)
    dlo = rng.normal(size=(B, D)).astype(np.float32)
    dlp = rng.normal(size=(B, D)).astype(np.float32)
    dco = rng.uniform(0.1, 0.9, size=(B,)).astype(np.float32)
    dcp = rng.uniform(0.1, 0.9, size=(B,)).astype(np.float32)
    dcs = rng.uniform(0.1, 0.9, size=(B,)).astype(np.float32)
    mus = rng.normal(size=(B, Z)).astype(np.float32)
    lv = rng.normal(size=(B, Z)).astype(np.float32)
    tgt = rng.normal(size=(B, P)).astype(np.float32)
    par = rng.normal(size=(B, P)).astype(np.float32)

    out = L.vaegan_losses(*map(jnp.asarray, (x, xt, dlo, dlp, dco, dcp, dcs, mus, lv, tgt, par)))

    kl_exp = -0.5 * np.sum(-np.exp(lv) - mus**2 + lv + 1, axis=1)
    np.testing.assert_allclose(np.asarray(out["kl"]), kl_exp, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["mse"]), np.sum(0.5 * (dlo - dlp) ** 2, axis=1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["bce_dis_original"]), -np.log(dco + 1e-3), rtol=1e-5
    )
    d = np.abs(par - tgt)
    sl1 = np.where(d < 1, 0.5 * d * d, d - 0.5)
    np.testing.assert_allclose(float(out["l1_param"]), sl1.sum() / B, rtol=1e-5)


def test_ellipse_param_loss():
    rng = np.random.default_rng(8)
    preds = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    out = L.ellipse_param_loss(preds, gt)
    g = np.asarray(gt).copy()
    g[:, :4] *= 10
    np.testing.assert_allclose(
        float(out["loss_cx"]), np.abs(np.asarray(preds)[:, 0] - g[:, 0]).mean(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out["loss_rest"]), np.abs(np.asarray(preds)[:, 2:] - g[:, 2:]).mean(), rtol=1e-5
    )


def test_hinge_loss():
    logit = jnp.asarray([0.5, -2.0, 3.0])
    np.testing.assert_allclose(
        float(L.hinge_loss(logit, "d_real")), np.mean([0.5, 3.0, 0.0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(L.hinge_loss(logit, "d_fake")), np.mean([1.5, 0.0, 4.0]), rtol=1e-6
    )
    np.testing.assert_allclose(float(L.hinge_loss(logit, "g")), -0.5, rtol=1e-6)
