"""Fused train step for the BE segmentation family (reference train_BE.py).

Loss (train_BE.py:58-60): per head (mask, edge)
  0.5 * BCEWithLogits(pred, target) + dice(sigmoid(pred), target)
optimized with Adam(lr) over every parameter except the torchvision-frozen
backbone stem/layer1 (resnet_fpn_backbone trainable_layers=3 default).
"""

import functools

import jax
import jax.numpy as jnp

from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState, stop_frozen_gradients


def make_be_train_step(model, compute_dtype=None, freeze_backbone=True):
    """jit (state, imgs, bimgs, eimgs) -> (state, metrics).

    imgs: (B, H, W, 3); bimgs/eimgs: (B, H, W, 1) binary targets.
    compute_dtype=bfloat16 runs forward/backward FLOPs in bf16, keeping
    master params / Adam state / BN stats / losses f32 (utils/amp.py).

    freeze_backbone=True (the reference semantics, torchvision
    trainable_layers=3) cuts gradients at the backbone stem/layer1 — it
    REQUIRES the state's optimizer to mask those same params (e.g.
    state.frozen_backbone_adam); pass False for full fine-tuning with an
    unmasked optimizer, otherwise the stem would silently stop training.
    """
    from vaeplay_tpu.utils.amp import merge_batch_stats, to_compute, to_f32

    def loss_fn(params, batch_stats, constants, imgs, bimgs, eimgs):
        # cut gradients at the torchvision-frozen stem/layer1 so XLA
        # dead-codes their backward (the optimizer mask already zeroes the
        # updates — numerics unchanged, see state.stop_frozen_gradients)
        if freeze_backbone:
            params = stop_frozen_gradients(params)
        variables = {"params": to_compute(params, compute_dtype),
                     "batch_stats": to_compute(batch_stats, compute_dtype)}
        if constants:
            variables["constants"] = to_compute(constants, compute_dtype)
        preds, mut = model.apply(
            variables, to_compute(imgs, compute_dtype), train=True,
            mutable=["batch_stats"]
        )
        preds = to_f32(preds)
        loss_edge = L.mask_edge_losses(preds["edges"], eimgs)
        loss_mask = L.mask_edge_losses(preds["masks"], bimgs)
        total = loss_edge + loss_mask
        return total, ({"loss_edge": loss_edge, "loss_mask": loss_mask},
                       merge_batch_stats(batch_stats, mut["batch_stats"],
                                         compute_dtype))

    @jax.jit
    def train_step(state: TrainState, imgs, bimgs, eimgs):
        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.constants, imgs, bimgs, eimgs
        )
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return state, metrics

    return train_step


def make_be_eval_step(model):
    @jax.jit
    def eval_step(state: TrainState, imgs):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if state.constants:
            variables["constants"] = state.constants
        preds = model.apply(variables, imgs, train=False)
        return {
            "edges": jax.nn.sigmoid(preds["edges"]),
            "masks": jax.nn.sigmoid(preds["masks"]),
        }

    return eval_step


def make_be_eval_step_packed(model, compute_dtype=None):
    """Serving variant of make_be_eval_step: jit (state, imgs) → bit-packed
    0.5-thresholded masks/edges, (B, S, ceil(S/8)) uint8 each.

    Both manga paste routes threshold the sigmoid maps at 0.5 immediately
    (eval/manga.py paste_result_on_manga / paste_edge_result_on_manga, per
    reference test_BE_manga.py:77-78,186), so shipping f32 probabilities
    wastes 32× device→host bandwidth — on a tunnel-attached host (~50 MB/s)
    the fetch dominates the whole serve pipeline.  The threshold is exact:
    sigmoid(x) ≥ 0.5 ⟺ x ≥ 0, so the device compares logits against zero
    (no sigmoid) and packs bits along W in np.unpackbits layout
    (models/bc.pack_mask_bits); unpack with steps_bc.unpack_mask_bits.

    compute_dtype=bfloat16 casts params + activations for the forward; the
    zero-threshold is insensitive to bf16 rounding except at borderline
    logits (same contract as BC's bridge mask)."""
    from vaeplay_tpu.models.bc import pack_mask_bits
    from vaeplay_tpu.utils.amp import to_compute

    @jax.jit
    def eval_step(state: TrainState, imgs):
        variables = {"params": to_compute(state.params, compute_dtype),
                     "batch_stats": to_compute(state.batch_stats, compute_dtype)}
        if state.constants:
            variables["constants"] = to_compute(state.constants, compute_dtype)
        preds = model.apply(variables, to_compute(imgs, compute_dtype),
                            train=False)
        return {
            "edges": pack_mask_bits((preds["edges"][..., 0] >= 0).astype(jnp.uint8)),
            "masks": pack_mask_bits((preds["masks"][..., 0] >= 0).astype(jnp.uint8)),
        }

    return eval_step
