"""Loss-library parity vs the reference tools/ops.py, imported read-only.

tools/ops.py only *uses* numpy/torch math, but tools/utils.py (which it
imports for angle_between) pulls in cv2/torchvision/skimage that don't exist
here — they're stubbed with empty modules so the reference loss functions run
unmodified.
"""

import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_ops():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    # stub the unavailable native-vision deps used by tools/utils.py imports
    for name in ("cv2", "rdp"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = sk.measure
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tff = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tf
        tf.functional = tff
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
        sys.modules["torchvision.transforms.functional"] = tff
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import tools.ops as ops  # reference, read-only
    return ops


from vaeplay_tpu.ops import losses as L  # noqa: E402


def test_dice_parity(ref_ops):
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(4, 16, 16)).astype(np.float32)
    b = (rng.uniform(size=(4, 16, 16)) > 0.5).astype(np.float32)
    expected = float(ref_ops.compute_dice_loss(torch.from_numpy(a), torch.from_numpy(b)))
    got = float(L.dice_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_edge_loss_parity(ref_ops):
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 1, 12, 12)).astype(np.float32)
    targets = (rng.uniform(size=(2, 1, 12, 12)) > 0.5).astype(np.float32)
    expected = float(ref_ops.edge_loss(torch.from_numpy(logits), torch.from_numpy(targets)))
    got = float(L.edge_loss(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(targets.transpose(0, 2, 3, 1)),
    ))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_hinge_parity(ref_ops):
    logit = np.asarray([0.4, -1.2, 2.5], np.float32)
    for mode in ("d_real", "d_fake", "g"):
        expected = float(ref_ops.compute_hinge_loss(torch.from_numpy(logit), mode))
        got = float(L.hinge_loss(jnp.asarray(logit), mode))
        np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_ellipse_param_loss_parity(ref_ops):
    rng = np.random.default_rng(2)
    preds = rng.normal(size=(4, 5)).astype(np.float32)
    gt = rng.normal(size=(4, 5)).astype(np.float32)
    expected = ref_ops.compute_ellipse_param_loss(
        torch.from_numpy(preds.copy()), torch.from_numpy(gt.copy()))
    got = L.ellipse_param_loss(jnp.asarray(preds), jnp.asarray(gt))
    for k in ("loss_cx", "loss_cy", "loss_rest"):
        np.testing.assert_allclose(float(got[k]), float(expected[k]), rtol=1e-5)


def test_pt_regression_parity(ref_ops):
    """Masked fixed-capacity chamfer == the reference's ragged-list version
    when every sample has the same (full) point counts."""
    rng = np.random.default_rng(3)
    B, N, M, K = 3, 9, 11, 5
    pred = rng.normal(size=(B, N, 2)).astype(np.float32)
    reg = rng.normal(size=(B, N, 2)).astype(np.float32)
    tgt = rng.normal(size=(B, M, 2)).astype(np.float32)
    key = rng.normal(size=(B, K, 2)).astype(np.float32)
    expected = float(ref_ops.compute_pt_regression_loss(
        [torch.from_numpy(pred[i]) for i in range(B)],
        torch.from_numpy(reg.copy()),
        [torch.from_numpy(tgt[i]) for i in range(B)],
        [torch.from_numpy(key[i]) for i in range(B)],
    ))
    ones = lambda *s: jnp.ones(s)
    got = float(L.chamfer_pt_regression_loss(
        jnp.asarray(pred), ones(B, N), jnp.asarray(reg),
        jnp.asarray(tgt), ones(B, M), jnp.asarray(key), ones(B, K)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_pt_regression_parity_ragged(ref_ops):
    """Ragged per-sample point counts (the normal BC case): samples must be
    weighted equally (per-sample MSE means, then batch mean), and a sample
    with zero predicted points must contribute exactly 0 (ops.py:43-45,63-65).
    """
    rng = np.random.default_rng(7)
    B, N, M, K = 4, 12, 10, 6
    ns, ms, ks = [5, 12, 0, 1], [7, 10, 4, 9], [2, 6, 3, 1]
    pred = rng.normal(size=(B, N, 2)).astype(np.float32)
    reg = rng.normal(size=(B, N, 2)).astype(np.float32)
    tgt = rng.normal(size=(B, M, 2)).astype(np.float32)
    key = rng.normal(size=(B, K, 2)).astype(np.float32)
    expected = float(ref_ops.compute_pt_regression_loss(
        [torch.from_numpy(pred[i, :ns[i]]) for i in range(B)],
        torch.from_numpy(reg.copy()),
        [torch.from_numpy(tgt[i, :ms[i]]) for i in range(B)],
        [torch.from_numpy(key[i, :ks[i]]) for i in range(B)],
    ))

    def mask(lengths, cap):
        return jnp.asarray(
            np.arange(cap)[None, :] < np.asarray(lengths)[:, None], np.float32)

    got = float(L.chamfer_pt_regression_loss(
        jnp.asarray(pred), mask(ns, N), jnp.asarray(reg),
        jnp.asarray(tgt), mask(ms, M), jnp.asarray(key), mask(ks, K)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_ellipse_pt_loss_parity(ref_ops):
    """Fixed-shape trigger/param loss == the reference's per-image-list
    version (tools/ops.py:83-166)."""
    rng = np.random.default_rng(4)
    B, S, D = 2, 64, 720
    triggers = rng.normal(size=(B, S, 2)).astype(np.float32)
    line = rng.normal(size=(B, S, 4)).astype(np.float32)
    # sample rows: px, py, dpx, dpy, index, radian
    idx = np.stack([rng.choice(D, size=S, replace=False) for _ in range(B)])
    sample = np.concatenate([
        rng.normal(size=(B, S, 4)).astype(np.float32),
        idx[..., None].astype(np.float32),
        rng.uniform(0, 2 * np.pi, size=(B, S, 1)).astype(np.float32),
    ], axis=-1)
    gt = rng.normal(size=(B, D, 6)).astype(np.float32)
    gt[..., 0] = (rng.uniform(size=(B, D)) > 0.5).astype(np.float32)

    preds = {
        "if_triggers": [torch.from_numpy(triggers[i]) for i in range(B)],
        "line_params": [torch.from_numpy(line[i]) for i in range(B)],
        "sample_infos": {
            "size": [S] * B,
            "sample": [torch.from_numpy(sample[i]) for i in range(B)],
        },
    }
    expected = ref_ops.compute_ellipse_pt_loss(
        preds, torch.from_numpy(gt.copy()))
    got = L.ellipse_pt_loss(
        jnp.asarray(triggers), jnp.asarray(line),
        jnp.asarray(sample[..., :5]), jnp.asarray(gt))
    np.testing.assert_allclose(float(got["trig_loss"]),
                               float(expected["trig_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(got["param_loss"]),
                               float(expected["param_loss"]), rtol=1e-4)


def test_bce_saturated_probs_match_torch_clamp():
    """p ∈ {0, 1}: torch clamps log terms at -100 and never NaNs — the
    rebuild must survive a saturated discriminator the same way (round-5
    real-chip Style_GAN regression: `1.0 - eps == 1.0` in f32 made the old
    prob-clip a no-op and 0*log(0) NaN'd the GAN)."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from vaeplay_tpu.ops import losses as L

    p = np.array([0.0, 1.0, 0.5, 1.0, 0.0], np.float32)
    t = np.array([1.0, 0.0, 1.0, 1.0, 0.0], np.float32)
    ref = F.binary_cross_entropy(torch.tensor(p), torch.tensor(t),
                                 reduction="none").numpy()
    got = np.asarray(L.bce(p, t))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_bce_saturated_grad_matches_torch_clamped_backward():
    """torch BCELoss backward = (p - t) / max(p(1-p), 1e-12): bounded at
    saturation where plain autodiff reaches 1/p ≈ 1e38 and overflows the
    downstream accumulations (the round-5 Style_GAN D-optimizer NaN)."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F

    from vaeplay_tpu.ops import losses as L

    p = np.array([1e-38, 0.0, 1.0, 0.3, 1.0 - 6e-8], np.float32)
    t = np.array([1.0, 1.0, 0.0, 1.0, 0.0], np.float32)
    tp = torch.tensor(p, requires_grad=True)
    F.binary_cross_entropy(tp, torch.tensor(t), reduction="sum").backward()
    ref = tp.grad.numpy()
    got = np.asarray(jax.grad(lambda q: jnp.sum(L.bce(q, jnp.asarray(t))))(
        jnp.asarray(p)))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-5)
