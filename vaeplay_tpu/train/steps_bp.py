"""Fused train step for BP (reference train_BP.py).

Each reference iteration runs TWO optimizer passes (train_BP.py:63-99):
  1. full model: ellipse L1 (cx/cy/rest) + emit-line loss (trigger CE+dice,
     param L1/MSE) on the predicted (detached) ellipse;
  2. teacher-forced: the emit-line predictor re-runs with ground-truth ellipse
     params (x VALUE_WEIGHT) and only the stage-2 loss backprops.
Both phases fuse into ONE jit program here: grad/update, then grad/update on
the updated params, matching the sequential optimizer semantics exactly.
"""

import functools

import jax
import jax.numpy as jnp

from vaeplay_tpu.models.bp import VALUE_WEIGHT
from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState


def _pt_loss(preds, p2_targets):
    return L.ellipse_pt_loss(
        preds["if_triggers"], preds["line_params"],
        preds["sample_infos"][..., :5], p2_targets,
    )


def make_bp_train_step(model, compute_dtype=None):
    """jit (state, imgs, p1_targets, p2_targets) -> (state, metrics).

    imgs: (B, H, W, 3) stacked [img, bmask, emask] channels (dataset.py:414);
    p1_targets: (B, 5) normalized ellipse params; p2_targets: (B, 720, 6)
    per-sample-point [trigger, x, y, dx, dy, length].
    compute_dtype=bfloat16 runs forward/backward FLOPs in bf16 with f32
    master params / Adam state / losses (utils/amp.py policy).
    """
    from vaeplay_tpu.utils.amp import to_compute, to_f32

    def loss_phase1(params, imgs, p1_targets, p2_targets):
        preds = to_f32(model.apply(
            {"params": to_compute(params, compute_dtype)},
            to_compute(imgs, compute_dtype), train=True))
        el = L.ellipse_param_loss(preds["ellipse_params"], p1_targets)
        pt = _pt_loss(preds, p2_targets)
        total = (el["loss_cx"] + el["loss_cy"] + el["loss_rest"]
                 + pt["trig_loss"] + pt["param_loss"])
        metrics = {
            "loss_cx": el["loss_cx"], "loss_cy": el["loss_cy"],
            "loss_rest": el["loss_rest"],
            "trig_loss": pt["trig_loss"], "param_loss": pt["param_loss"],
        }
        return total, metrics

    def loss_phase2(params, imgs, p1_scaled, p2_targets):
        # p1_scaled stays f32: they are coordinates (the model upcasts its
        # ellipse-param input anyway; bf16 would just pre-quantize the GT).
        preds = to_f32(model.apply(
            {"params": to_compute(params, compute_dtype)},
            to_compute(imgs, compute_dtype), p1_scaled,
            train=True, method=model.emit_line_only,
        ))
        pt = _pt_loss(preds, p2_targets)
        total = pt["trig_loss"] + pt["param_loss"]
        return total, {"pos_trig_loss": pt["trig_loss"],
                       "pos_param_loss": pt["param_loss"]}

    @jax.jit
    def train_step(state: TrainState, imgs, p1_targets, p2_targets):
        grads, m1 = jax.grad(loss_phase1, has_aux=True)(
            state.params, imgs, p1_targets, p2_targets
        )
        state = state.apply_gradients(grads)
        p1_scaled = p1_targets.at[:, :4].set(p1_targets[:, :4] * VALUE_WEIGHT)
        grads, m2 = jax.grad(loss_phase2, has_aux=True)(
            state.params, imgs, p1_scaled, p2_targets
        )
        state = state.apply_gradients(grads)
        return state, {**m1, **m2}

    return train_step
