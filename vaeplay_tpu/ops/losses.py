"""Loss library — TPU-native rebuild of reference tools/ops.py.

All losses are pure jnp functions over fixed-shape, mask-padded tensors
(ragged point sets use the fixed-capacity + validity-mask convention, see
SURVEY.md §7 "Ragged point sets").  Every function cites the reference
implementation whose values it reproduces.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

# tools/ops.py:10 — shared coordinate scale for point/param regression heads
VALUE_WEIGHT = 10.0


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of x over elements where mask (broadcastable to x) is truthy."""
    if mask is None:
        return jnp.mean(x)
    mask = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
    denom = jnp.sum(mask)
    return jnp.sum(x * mask) / jnp.maximum(denom, 1.0)


def sigmoid_bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy on logits (= torch BCEWithLogitsLoss)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@jax.custom_vjp
def _bce_clamped(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    lp = jnp.maximum(jnp.log(probs), -100.0)
    ln = jnp.maximum(jnp.log(1.0 - probs), -100.0)
    return -(targets * lp + (1.0 - targets) * ln)


def _bce_fwd(probs, targets):
    return _bce_clamped(probs, targets), (probs, targets)


def _bce_bwd(res, g):
    probs, targets = res
    # torch BCELoss backward: (p - t) / max(p * (1 - p), 1e-12) — the
    # clamped denominator bounds the prob-space gradient at ~1e12 where a
    # saturated p (one bf16 sigmoid step past ~6 quantizes to exactly
    # 0.0/1.0, and p near the f32 min-normal gives 1/p ≈ 1e38) would
    # otherwise overflow the backward's conv/weight accumulations to
    # inf → NaN.  This is what poisoned the Style_GAN D optimizer on the
    # round-5 real-chip run once D saturated; torch's reference trainer
    # survives the same regime because of exactly this clamp.
    d_p = g * (probs - targets) / jnp.maximum(probs * (1.0 - probs), 1e-12)
    lp = jnp.maximum(jnp.log(probs), -100.0)
    ln = jnp.maximum(jnp.log(1.0 - probs), -100.0)
    d_t = g * (ln - lp)
    return d_p, d_t


_bce_clamped.defvjp(_bce_fwd, _bce_bwd)


def bce(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Elementwise BCE on probabilities (= torch F.binary_cross_entropy:
    log terms clamped at -100, backward denominator clamped at 1e-12).

    The original `clip(probs, eps, 1 - eps)` guard was a silent no-op on the
    saturated-high side — `1.0 - 1e-12` rounds to exactly 1.0 in f32 — so a
    discriminator output saturating to 1.0 produced `0 * log(0) = NaN`; and
    plain autodiff of the clamped-log forward still yields 1/p-scale (1e38)
    cotangents that overflow downstream bf16/f32 accumulations.  Both
    failure modes are fixed by reproducing torch's forward AND backward
    clamps (custom_vjp above); regression-gated by
    tests/test_parity_losses.py::test_bce_saturated_{probs,grad}_match_torch*."""
    del eps  # kept for call-site compatibility; torch clamps logs, not probs
    return _bce_clamped(probs, targets)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE with integer labels (= torch F.cross_entropy, no reduce)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1/Huber (= torch F.smooth_l1_loss, no reduce)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Soft-dice over per-sample flattened maps (reference tools/ops.py:12-19).

    inputs/targets: (B, ...) probabilities; returns scalar 1 - mean dice.
    """
    b = inputs.shape[0]
    iflat = inputs.reshape(b, -1)
    tflat = targets.reshape(b, -1)
    inter = jnp.sum(iflat * tflat, axis=1)
    score = (2.0 * inter + smooth) / (jnp.sum(iflat, axis=1) + jnp.sum(tflat, axis=1) + smooth)
    return 1.0 - jnp.mean(score)


def mask_edge_losses(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """0.5*BCEwithLogits + dice(sigmoid) — the BE/BC head loss
    (reference train_BE.py:58-60)."""
    b_loss = jnp.mean(sigmoid_bce_with_logits(logits, targets)) * 0.5
    d_loss = dice_loss(jax.nn.sigmoid(logits), targets)
    return b_loss + d_loss


def hinge_loss(logit: jnp.ndarray, mode: str) -> jnp.ndarray:
    """reference tools/ops.py:168-176."""
    assert mode in ("d_real", "d_fake", "g")
    if mode == "d_real":
        return jnp.mean(nn_relu(1.0 - logit))
    if mode == "d_fake":
        return jnp.mean(nn_relu(1.0 + logit))
    return -jnp.mean(logit)


def nn_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


# 3x3 Laplacian / 8, fixed (reference tools/ops.py:193-200)
_LAPLACIAN = (
    jnp.array([[-1.0, -1.0, -1.0], [-1.0, 8.0, -1.0], [-1.0, -1.0, -1.0]]) / 8.0
)


def laplacian_edges(x: jnp.ndarray) -> jnp.ndarray:
    """|laplacian filter| on an NHWC single-channel map (tools/ops.py:203-211).

    Computed with shifted adds on the squeezed (B, H, W) array rather than a
    1-channel conv: TPU convs put channels on the 128-lane axis, so a C=1
    conv at 512^2 is lane-padded 128x (~17 GB of HBM traffic per BE_GAN step,
    measured ~140 ms); the elementwise form keeps W on the lane axis and is
    ~100x faster with identical values (zero-padded borders)."""
    y = x[..., 0]
    p = jnp.pad(y, ((0, 0), (1, 1), (1, 1)))
    neighbors = (
        p[:, :-2, :-2] + p[:, :-2, 1:-1] + p[:, :-2, 2:]
        + p[:, 1:-1, :-2] + p[:, 1:-1, 2:]
        + p[:, 2:, :-2] + p[:, 2:, 1:-1] + p[:, 2:, 2:]
    )
    lap = (8.0 * y - neighbors) / 8.0
    return jnp.abs(lap)[..., None]


def edge_loss(mask_logits: jnp.ndarray, mask_targets: jnp.ndarray) -> jnp.ndarray:
    """Dice between |laplacian| responses of prediction and target
    (reference tools/ops.py:187-214; note the reference applies the filter to
    raw logits, reproduced here)."""
    return dice_loss(laplacian_edges(mask_logits), laplacian_edges(mask_targets))


def chamfer_pt_regression_loss(
    pred_pts: jnp.ndarray,       # (B, N, 2) predicted contour points
    pred_mask: jnp.ndarray,      # (B, N) validity
    pred_regress: jnp.ndarray,   # (B, N, 2) predicted per-point regressions
    target_pts: jnp.ndarray,     # (B, M, 2) target contour points
    target_mask: jnp.ndarray,    # (B, M) validity
    key_pts: jnp.ndarray,        # (B, K, 2) RDP key points
    key_mask: jnp.ndarray,       # (B, K) validity
) -> jnp.ndarray:
    """Mask-aware rebuild of compute_pt_regression_loss (tools/ops.py:21-66).

    Per sample: bidirectional nearest-neighbour match between predicted and
    target contours; MSE between the predicted regression vectors and the true
    offset to the matched point.  Each direction's MSE is a PER-SAMPLE mean
    (torch F.mse_loss reduction='mean' inside the per-image loop,
    ops.py:43-45); samples with zero predicted points contribute exactly 0
    (ops.py:63-64); the final loss is the plain mean over the batch
    (ops.py:65) — so samples weigh equally regardless of point counts.
    Full-contour term weighted (p2t=1.0, t2p=0.1) plus a key-point term
    (p2t=0.0, t2p=2.0).
    """

    def per_sample_mean(x, mask):
        # x (B, ...), mask broadcastable to x: per-sample masked mean → (B,)
        mask = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
        b = x.shape[0]
        num = jnp.sum((x * mask).reshape(b, -1), axis=1)
        den = jnp.sum(mask.reshape(b, -1), axis=1)
        return num / jnp.maximum(den, 1.0)

    def one_direction_losses(tgt, tmask):
        # dif[b, i, j, :] = tgt[b, j] - pred[b, i]
        dif = tgt[:, None, :, :] - pred_pts[:, :, None, :]          # (B, N, M, 2)
        dist = jnp.linalg.norm(dif, axis=-1)                        # (B, N, M)
        big = jnp.asarray(1e30, dist.dtype)
        dist_pt = jnp.where(tmask[:, None, :] > 0, dist, big)       # mask targets
        dist_tp = jnp.where(pred_mask[:, :, None] > 0, dist, big)   # mask preds
        p2t_idx = jnp.argmin(dist_pt, axis=2)                       # (B, N)
        t2p_idx = jnp.argmin(dist_tp, axis=1)                       # (B, M)
        # p2t: regression of each valid predicted point vs offset to its match
        dif_p2t = jnp.take_along_axis(dif, p2t_idx[:, :, None, None].repeat(2, -1), axis=2)[:, :, 0, :]
        loss_p2t = per_sample_mean((pred_regress - dif_p2t) ** 2, pred_mask[:, :, None])
        # t2p: regression of the matched predicted point vs offset to the target
        reg_t2p = jnp.take_along_axis(pred_regress, t2p_idx[:, :, None].repeat(2, -1), axis=1)
        # dif[b, t2p_idx[b, j], j, :] — offset from the matched pred to target j
        m = tgt.shape[1]
        jidx = jnp.arange(m)
        dif_t2p = jnp.take_along_axis(
            dif, t2p_idx[:, :, None, None].repeat(2, -1), axis=1
        )[:, jidx, jidx, :]                                          # (B, M, 2)
        loss_t2p = per_sample_mean((reg_t2p - dif_t2p) ** 2, tmask[:, :, None])
        return loss_p2t, loss_t2p

    full_p2t, full_t2p = one_direction_losses(target_pts, target_mask)
    _, key_t2p = one_direction_losses(key_pts, key_mask)
    # any sample with zero predicted points contributes zero (ops.py:63-64)
    any_pred = jnp.any(pred_mask > 0, axis=1)                        # (B,)
    loss = 1.0 * full_p2t + 0.1 * full_t2p + 2.0 * key_t2p           # (B,)
    return jnp.mean(jnp.where(any_pred, loss, 0.0))


def ellipse_param_loss(preds: jnp.ndarray, gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """reference tools/ops.py:68-81: gt[:, :4] scaled by VALUE_WEIGHT, per-part L1."""
    gt = gt.at[:, :4].set(gt[:, :4] * VALUE_WEIGHT)
    return {
        "loss_cx": jnp.mean(jnp.abs(preds[:, 0] - gt[:, 0])),
        "loss_cy": jnp.mean(jnp.abs(preds[:, 1] - gt[:, 1])),
        "loss_rest": jnp.mean(jnp.abs(preds[:, 2:] - gt[:, 2:])),
    }


def ellipse_pt_loss(
    pred_triggers: jnp.ndarray,    # (B, S, 2) trigger logits per sampled point
    pred_line_params: jnp.ndarray, # (B, S, 4) offset_x, offset_y, theta, length
    sample_info: jnp.ndarray,      # (B, S, 5) px, py, dpx, dpy, degree-index
    gt_targets: jnp.ndarray,       # (B, D, 6) per-degree: trig, x, y, dx, dy, len
) -> Dict[str, jnp.ndarray]:
    """Rebuild of compute_ellipse_pt_loss (tools/ops.py:83-166), batched.

    Targets are gathered per sampled ellipse point by its degree index; the
    trigger head gets CE (split into trig/non-trig means) + dice on the two
    softmax channels; line params get L1 on [dx, dy, angle] split by group and
    MSE+L1 on length over triggered points only.
    """
    b, s, _ = pred_triggers.shape
    deg = sample_info[..., 4].astype(jnp.int32)                     # (B, S)
    ts = jnp.take_along_axis(gt_targets, deg[..., None].repeat(gt_targets.shape[-1], -1), axis=1)
    trig_t = ts[..., 0]                                             # (B, S)
    # target params (tools/ops.py:110-115)
    tgt_param = jnp.stack(
        [
            (ts[..., 1] - sample_info[..., 0]) * VALUE_WEIGHT,
            (ts[..., 2] - sample_info[..., 1]) * VALUE_WEIGHT,
            jnp.arccos(jnp.clip(ts[..., 3] * sample_info[..., 2]
                                + ts[..., 4] * sample_info[..., 3], -1.0, 1.0)),
            ts[..., 5] * VALUE_WEIGHT,
        ],
        axis=-1,
    )                                                               # (B, S, 4)
    trig_lbl = (trig_t >= 0.5)
    labels = trig_t.astype(jnp.int32)
    ce = softmax_cross_entropy(pred_triggers, labels)               # (B, S)
    ce_trig = masked_mean(ce, trig_lbl)
    ce_non = masked_mean(ce, ~trig_lbl)
    trig_loss = ce_trig + ce_non
    probs = jax.nn.softmax(pred_triggers, axis=-1)
    # the reference feeds the concatenated (sum S,) vector into
    # compute_dice_loss, whose per-sample flatten makes it a PER-ELEMENT dice
    # averaged over points (tools/ops.py:12-19 with nums = sum S)
    d0 = dice_loss(probs[..., 0].reshape(-1, 1), (1.0 - trig_t).reshape(-1, 1))
    d1 = dice_loss(probs[..., 1].reshape(-1, 1), trig_t.reshape(-1, 1))
    trig_loss = (trig_loss + (d0 + d1) / 2.0) * 2.0

    l1 = jnp.abs(pred_line_params - tgt_param)
    param_normal = (
        masked_mean(l1[..., :3], trig_lbl[..., None])
        + masked_mean(l1[..., :3], (~trig_lbl)[..., None])
    )
    sq = (pred_line_params[..., 3] - tgt_param[..., 3]) ** 2
    param_length = masked_mean(sq, trig_lbl) + masked_mean(l1[..., 3], trig_lbl)
    return {"trig_loss": trig_loss, "param_loss": param_length + param_normal}


def vaegan_losses(
    x: jnp.ndarray,
    x_tilde: jnp.ndarray,
    disc_layer_original: jnp.ndarray,
    disc_layer_predicted: jnp.ndarray,
    disc_class_original: jnp.ndarray,
    disc_class_predicted: jnp.ndarray,
    disc_class_sampled: jnp.ndarray,
    mus: jnp.ndarray,
    log_variances: jnp.ndarray,
    targets: jnp.ndarray,
    params: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """The circle VAE-GAN loss bundle (reference models/networks.py:264-281).

    Returns the per-sample pieces the trainer composes (train.py:54-66):
      nle   0.5*(x - x_tilde)^2 summed per sample (diagnostic)
      kl    -0.5 * sum(-exp(logvar) - mu^2 + logvar + 1) per sample
      mse   sum(0.5*(layer_orig - layer_pred)^2) per sample
      bce_* -log(D(.) +- 1e-3) per sample
      l1_param  smooth_l1(targets, params) summed / batch
    """
    b = x.shape[0]
    nle = jnp.sum(0.5 * (x.reshape(b, -1) - x_tilde.reshape(b, -1)) ** 2, axis=1)
    kl = -0.5 * jnp.sum(
        -jnp.exp(log_variances) - mus**2 + log_variances + 1.0, axis=1
    )
    mse = jnp.sum(0.5 * (disc_layer_original - disc_layer_predicted) ** 2, axis=1)
    bce_dis_original = -jnp.log(disc_class_original + 1e-3)
    bce_dis_predicted = -jnp.log(1.0 - disc_class_predicted + 1e-3)
    bce_dis_sampled = -jnp.log(1.0 - disc_class_sampled + 1e-3)
    l1_param = jnp.sum(smooth_l1(params, targets)) / b
    return {
        "nle": nle,
        "kl": kl,
        "mse": mse,
        "bce_dis_original": bce_dis_original,
        "bce_dis_predicted": bce_dis_predicted,
        "bce_dis_sampled": bce_dis_sampled,
        "l1_param": l1_param,
    }
