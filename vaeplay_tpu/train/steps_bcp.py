"""Fused two-phase GAN step for BCP (reference train_BCP.py:69-147).

annotation points (B, P, 6) = [sx, sy, dx, dy, freq, is_key] normalized, plus
a validity mask (fixed capacity replaces the reference's ragged repack).

D phase: BCE(real=[gt_xy, gt_offsets]*W → 1, fake=[contours*W, pred_offsets]
→ 0) * 0.5, Adam(lr_disc).
G phase: class CE + 4*(freq-one L1 + balanced freq-zero L1) + 10*offset L1
+ 6*key-point offset L1 + adv BCE, Adam(lr).  The reference recomputes the
identical G forward for this phase (train_BCP.py:71,96 — G params unchanged
in between); here one jax.vjp linearization serves both phases (exact same
gradients, equivalence-gated by
tests/test_bcp.py::test_shared_vjp_step_matches_two_pass).
"""

import functools

import jax
import jax.numpy as jnp
from flax import struct

from vaeplay_tpu.models.bcp import VALUE_WEIGHT
from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState
from vaeplay_tpu.train.steps_be_gan import GanState


def make_bcp_train_step(g_model, d_model, compute_dtype=None):
    """jit (gan_state, imgs, labels, points, pmask) -> (gan_state, metrics).

    imgs (B, H, W, 3) [img, bmask, emask]; labels (B,); points (B, P, 6);
    pmask (B, P) validity.  compute_dtype=bfloat16 runs both nets' FLOPs in
    bf16 with f32 master params / Adam state / losses (utils/amp.py)."""
    from vaeplay_tpu.utils.amp import to_compute, to_f32

    def g_forward(params, imgs, contours, counts):
        return to_f32(g_model.apply(
            {"params": to_compute(params, compute_dtype)},
            to_compute(imgs, compute_dtype), to_compute(contours, compute_dtype),
            counts, train=True))

    def d_forward(params, imgs, targets):
        return to_f32(d_model.apply(
            {"params": to_compute(params, compute_dtype)},
            to_compute(imgs, compute_dtype), to_compute(targets, compute_dtype),
            train=True))

    @jax.jit
    def train_step(gs: GanState, imgs, labels, points, pmask):
        g, d = gs.g, gs.d
        counts = jnp.sum(pmask, axis=1).astype(jnp.int32)
        contours = points[..., :2] * pmask[..., None]
        valid3 = pmask[..., None]

        # ONE G forward serves both phases.  The reference runs net(imgs)
        # twice with identical G params — under no_grad for the D phase
        # (train_BCP.py:71) and again for the G phase (:96) — so the two
        # forwards produce identical values.  Linearize G once with jax.vjp:
        # the D phase consumes the primal outputs (stop-gradient), the G
        # phase pulls its loss cotangent back through the stored residuals.
        # Exact same gradients (equivalence test below).  Measured perf is
        # NEUTRAL at the reference 512px/bs16/2048pt bf16 workload (85.1 vs
        # 85.8 ms/step, tools/profile_bcp.py) — XLA reaches the same schedule
        # for both forms — but the sharing is now structural instead of
        # depending on the compiler's CSE/remat choices.
        def g_heads(g_params):
            preds = g_forward(g_params, imgs, contours, counts)
            return (preds["classes"], preds["target_pts"],
                    preds["target_frequency"])

        (cls_out, target_pts, target_freq), g_pull = jax.vjp(g_heads, g.params)

        # ---- D phase (G under stop_gradient, train_BCP.py:70-93)
        fake_targets = jax.lax.stop_gradient(
            jnp.concatenate(
                [contours * VALUE_WEIGHT, target_pts], axis=-1
            ) * valid3
        )
        real_targets = points[..., :4] * VALUE_WEIGHT * valid3

        def d_loss_fn(d_params):
            real_out = d_forward(d_params, imgs, real_targets)
            fake_out = d_forward(d_params, imgs, fake_targets)
            d_real = jnp.mean(L.bce(real_out, jnp.ones_like(real_out), eps=1e-12))
            d_fake = jnp.mean(L.bce(fake_out, jnp.zeros_like(fake_out), eps=1e-12))
            return (d_real + d_fake) * 0.5, (d_real, d_fake)

        d_grads, (d_real, d_fake) = jax.grad(d_loss_fn, has_aux=True)(d.params)
        d = d.apply_gradients(d_grads)

        # ---- G phase against updated D (train_BCP.py:96-147); differentiates
        # w.r.t. the shared forward's head outputs, then pulls back through G.
        def g_loss_fn(heads):
            h_cls, h_pts, h_freq = heads
            loss_class = jnp.mean(L.softmax_cross_entropy(h_cls, labels))
            freq_pred = h_freq                               # (B, P)
            ft = (points[..., 4] > 0.1) & (pmask > 0)
            nt = (points[..., 4] <= 0.1) & (pmask > 0)
            loss_f1 = L.masked_mean(jnp.abs(freq_pred - 1.0), ft)
            sum_trig = jnp.maximum(jnp.sum(ft), 1)
            loss_f0 = jnp.where(
                jnp.sum(nt) > 0,
                jnp.sum(jnp.abs(freq_pred) * nt) / sum_trig,
                0.0,
            )
            gt_off = points[..., 2:4] * VALUE_WEIGHT
            diff = jnp.abs(h_pts - gt_off)
            loss_total = L.masked_mean(diff, pmask[..., None])
            key = (points[..., 5] > 0.9) & (pmask > 0)
            key_cnt = jnp.maximum(jnp.sum(key), 1)
            loss_key = jnp.sum(jnp.sum(diff, axis=-1) * key) / key_cnt
            fake = jnp.concatenate(
                [contours * VALUE_WEIGHT, h_pts], axis=-1
            ) * valid3
            adv = d_forward(d.params, imgs, fake)
            g_adv = jnp.mean(L.bce(adv, jnp.ones_like(adv), eps=1e-12))
            total = (loss_class + (loss_f1 + loss_f0) * 4.0
                     + loss_total * 10.0 + loss_key * 6.0 + g_adv)
            return total, {
                "loss_class": loss_class, "loss_frequency_one": loss_f1,
                "loss_frequency_zero": loss_f0, "loss_total_regress": loss_total,
                "loss_key_regress": loss_key, "g_adv_loss": g_adv,
            }

        head_cots, gm = jax.grad(g_loss_fn, has_aux=True)(
            (cls_out, target_pts, target_freq))
        (g_grads,) = g_pull(head_cots)
        g = g.apply_gradients(g_grads)
        return GanState(g=g, d=d), {
            "d_adv_real": d_real, "d_adv_fake": d_fake, **gm,
        }

    return train_step
