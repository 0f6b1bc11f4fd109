"""Fused two-phase GAN step for BE_GAN (reference train_BE_GAN.py:130-165).

One jit program per iteration:
  D phase: G forward (stopped gradients, BN stats still advance — torch runs
  it under no_grad in train mode), then
    d_adv  = 1 - mean|D(img, G_masks).feats - D(img, gt).feats|
    d_type = CE(D(img, gt).type, labels)
  Adam(lr*0.1, betas=(0.5, 0.999)) update on D.
  G phase (against the UPDATED D):
    2*(mask BCE+dice) + 2*(edge BCE+dice) + mean|D(img, G).feats -
    stop_grad(D(img, gt).feats)| + CE(D(img, G).type, labels)
    + 0.5*(laplacian edge_loss on both heads)
  Adam(lr, betas=(0.5, 0.999)) update on G.
BN batch_stats of both nets are threaded through every forward in the same
order as the reference's sequential torch calls.
"""

from typing import Any, Dict

import functools

import jax
import jax.numpy as jnp
from flax import struct

from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState, stop_frozen_gradients


class GanState(struct.PyTreeNode):
    g: TrainState
    d: TrainState


def make_be_gan_train_step(g_model, d_model, split: bool = True,
                           freeze_backbone: bool = True,
                           compute_dtype=None):
    """(gan_state, imgs, bimgs, eimgs, labels) -> (gan_state, metrics).

    With split=True (default) the D and G phases compile as TWO programs
    called back to back: at the reference 512px/bs16 workload the fused
    single program needs ~13GB of HLO temps against 15.75GB HBM and XLA's
    memory-pressure scheduling makes it ~45x slower than the same FLOPs in
    the BE step; splitting halves peak temps and restores full speed.  The
    numerics are identical — the phases are sequential either way.

    compute_dtype=bfloat16 runs forward/backward FLOPs of both nets in bf16;
    master params / Adam state / BN stats / loss reductions stay f32
    (utils/amp.py policy).
    """
    from vaeplay_tpu.utils.amp import merge_batch_stats, to_compute, to_f32

    def merge_bs(master, mutated):
        return merge_batch_stats(master, mutated, compute_dtype)

    def g_apply(params, batch_stats, constants, imgs):
        # frozen-stem gradient cut (state.stop_frozen_gradients): the
        # optimizer mask already zeroes conv1/layer1 updates, this lets XLA
        # dead-code their backward in the G phase (no-op in the D phase).
        # freeze_backbone=True REQUIRES the G optimizer to mask conv1/layer1
        # (state.frozen_backbone_adam); pass False for full fine-tuning.
        if freeze_backbone:
            params = stop_frozen_gradients(params)
        variables = {"params": to_compute(params, compute_dtype),
                     "batch_stats": to_compute(batch_stats, compute_dtype)}
        if constants:
            variables["constants"] = to_compute(constants, compute_dtype)
        out, mut = g_model.apply(variables, to_compute(imgs, compute_dtype),
                                 train=True, mutable=["batch_stats"])
        return to_f32(out), to_f32(mut)

    def d_apply(params, batch_stats, imgs, m1, m2):
        out, mut = d_model.apply(
            {"params": to_compute(params, compute_dtype),
             "batch_stats": to_compute(batch_stats, compute_dtype)},
            to_compute(imgs, compute_dtype), to_compute(m1, compute_dtype),
            to_compute(m2, compute_dtype), train=True, mutable=["batch_stats"],
        )
        return to_f32(out), to_f32(mut)

    @jax.jit
    def d_phase(gs: GanState, imgs, bimgs, eimgs, labels):
        g, d = gs.g, gs.d
        # G forward without gradients (BN stats advance, train_BE_GAN.py:131-134)
        preds, mutg = g_apply(g.params, g.batch_stats, g.constants, imgs)
        g = g.replace(batch_stats=merge_bs(g.batch_stats, mutg["batch_stats"]))
        pred_masks = jax.nn.sigmoid(jax.lax.stop_gradient(preds["masks"]))
        pred_edges = jax.nn.sigmoid(jax.lax.stop_gradient(preds["edges"]))

        def d_loss_fn(d_params, d_bs):
            (d_real_type, d_real_feats), mut1 = d_apply(d_params, d_bs, imgs, bimgs, eimgs)
            (_, d_fake_feats), mut2 = d_apply(
                d_params, mut1["batch_stats"], imgs, pred_masks, pred_edges
            )
            d_adv = 1.0 - jnp.mean(jnp.abs(d_fake_feats - d_real_feats))
            d_type = jnp.mean(L.softmax_cross_entropy(d_real_type, labels))
            return d_adv + d_type, ((d_adv, d_type), mut2["batch_stats"])

        d_grads, ((d_adv, d_type), d_bs) = jax.grad(d_loss_fn, has_aux=True)(
            d.params, d.batch_stats
        )
        d = d.apply_gradients(d_grads,
                              new_batch_stats=merge_bs(d.batch_stats, d_bs))
        return GanState(g=g, d=d), {"d_adv_loss": d_adv, "d_type_loss": d_type}

    @jax.jit
    def g_phase(gs: GanState, imgs, bimgs, eimgs, labels):
        g, d = gs.g, gs.d

        def g_loss_fn(g_params, g_bs, d_bs):
            preds, mutg2 = g_apply(g_params, g_bs, g.constants, imgs)
            pm, pe = preds["masks"], preds["edges"]
            # real-feats pass: no grad (torch.no_grad, train_BE_GAN.py:151-152)
            (_, real_feats), mut3 = d_apply(d.params, d_bs, imgs, bimgs, eimgs)
            real_feats = jax.lax.stop_gradient(real_feats)
            (g_pred_type, g_pred_feats), mut4 = d_apply(
                d.params, mut3["batch_stats"], imgs,
                jax.nn.sigmoid(pm), jax.nn.sigmoid(pe),
            )
            loss_mask = L.mask_edge_losses(pm, bimgs)
            loss_edge = L.mask_edge_losses(pe, eimgs)
            g_adv = jnp.mean(jnp.abs(g_pred_feats - real_feats))
            g_type = jnp.mean(L.softmax_cross_entropy(g_pred_type, labels))
            loss_cnt = (L.edge_loss(jax.nn.sigmoid(pm), bimgs)
                        + L.edge_loss(jax.nn.sigmoid(pe), eimgs))
            total = loss_mask * 2 + loss_edge * 2 + g_adv + g_type + loss_cnt * 0.5
            metrics = {"loss_mask": loss_mask, "loss_edge": loss_edge,
                       "g_adv_loss": g_adv, "g_type_loss": g_type,
                       "loss_cnt": loss_cnt}
            return total, (metrics, mutg2["batch_stats"], mut4["batch_stats"])

        g_grads, (gm, g_bs2, d_bs2) = jax.grad(g_loss_fn, has_aux=True)(
            g.params, g.batch_stats, d.batch_stats
        )
        g = g.apply_gradients(g_grads,
                              new_batch_stats=merge_bs(g.batch_stats, g_bs2))
        d = d.replace(batch_stats=merge_bs(d.batch_stats, d_bs2))
        return GanState(g=g, d=d), gm

    if not split:
        @jax.jit
        def fused(gs, imgs, bimgs, eimgs, labels):
            gs, dm = d_phase(gs, imgs, bimgs, eimgs, labels)
            gs, gm = g_phase(gs, imgs, bimgs, eimgs, labels)
            return gs, {**dm, **gm}

        return fused

    def train_step(gs, imgs, bimgs, eimgs, labels):
        gs, dm = d_phase(gs, imgs, bimgs, eimgs, labels)
        gs, gm = g_phase(gs, imgs, bimgs, eimgs, labels)
        return gs, {**dm, **gm}

    train_step.d_phase = d_phase  # exposed for profiling
    train_step.g_phase = g_phase
    return train_step
