"""Fused three-phase train step for BE_font (reference train_BE_font.py:97-178).

Phase D (Adam lr): BCE(D(gt masks+edges)→1) + aux CE + BCE(D(G preds)→0),
  d_loss = 0.5*(real+fake) + aux_real.
Phase G (Adam lr over ALL generator params): 10*(mask BCE+dice) +
  10*(edge BCE+dice) + 2*adv BCE + loss_g_aux — which the reference sets to
  loss_g_adv*5 (train_BE_font.py:142; the aux CE is computed but unused for G;
  reproduced as-is, with the real aux CE logged).
Phase S (Adam lr over style_encoder only): run the updated G with labels
  (no grad) and with self-encoded style; 1*(mask+edge losses on the
  self-encoded preds) + 2*L1 distillation toward the label-conditioned preds.

All three phases, including BN batch_stats threading in reference call order,
run inside one jit program.
"""

from typing import Any

import functools

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState, torch_adam


class FontState(struct.PyTreeNode):
    g: TrainState             # full-generator optimizer (phase G)
    style_opt_state: Any      # style-encoder-only optimizer state (phase S)
    d: TrainState


def style_only_tx(lr: float) -> optax.GradientTransformation:
    def label_tree(params):
        return {k: jax.tree_util.tree_map(
            lambda _: "style" if k == "style_encoder" else "rest", v)
            for k, v in params.items()}

    return optax.multi_transform(
        {"style": torch_adam(lr), "rest": optax.set_to_zero()}, label_tree)


def create_font_state(g_model, d_model, gv, dv, lr: float) -> FontState:
    g = TrainState.create(g_model.apply, gv["params"], gv["batch_stats"],
                          torch_adam(lr))
    d = TrainState.create(d_model.apply, dv["params"], dv["batch_stats"],
                          torch_adam(lr))
    s_tx = style_only_tx(lr)
    return FontState(g=g, style_opt_state=s_tx.init(gv["params"]), d=d)


def make_be_font_train_step(g_model, d_model, lr: float, compute_dtype=None):
    """compute_dtype=bfloat16 runs all three phases' FLOPs in bf16 with f32
    master params / Adam state / BN stats / losses (utils/amp.py policy)."""
    from vaeplay_tpu.utils.amp import merge_batch_stats, to_compute, to_f32

    def merge_bs(master, mutated):
        return merge_batch_stats(master, mutated, compute_dtype)

    s_tx = style_only_tx(lr)

    def g_apply(params, bs, imgs, y):
        out, mut = g_model.apply(
            {"params": to_compute(params, compute_dtype),
             "batch_stats": to_compute(bs, compute_dtype)},
            to_compute(imgs, compute_dtype), y=to_compute(y, compute_dtype),
            train=True, mutable=["batch_stats"],
        )
        return to_f32(out), to_f32(mut)

    def d_apply(params, bs, x, y):
        out, mut = d_model.apply(
            {"params": to_compute(params, compute_dtype),
             "batch_stats": to_compute(bs, compute_dtype)},
            to_compute(x, compute_dtype), to_compute(y, compute_dtype),
            train=True, mutable=["batch_stats"],
        )
        return to_f32(out), to_f32(mut)

    @jax.jit
    def train_step(fs: FontState, imgs, masks, edges, labels, styles):
        g, d = fs.g, fs.d
        b = imgs.shape[0]
        onehot = jax.nn.one_hot(labels, 143, dtype=styles.dtype)
        y_map = {"cls": onehot, "cnt_style": styles}

        # ---- D phase
        preds, mutg = g_apply(g.params, g.batch_stats, imgs, y_map)
        g = g.replace(batch_stats=merge_bs(g.batch_stats, mutg["batch_stats"]))
        fake_merge = jax.lax.stop_gradient(
            jnp.concatenate([preds["masks"], preds["edges"]], axis=-1))
        real_merge = jnp.concatenate([masks, edges], axis=-1)

        def d_loss_fn(d_params, d_bs):
            (gt_adv, gt_aux), m1 = d_apply(d_params, d_bs, real_merge, y_map)
            (pd_adv, _), m2 = d_apply(d_params, m1["batch_stats"], fake_merge, y_map)
            d_real = jnp.mean(L.bce(gt_adv, jnp.ones_like(gt_adv)))
            d_aux = jnp.mean(L.softmax_cross_entropy(gt_aux, labels))
            d_fake = jnp.mean(L.bce(pd_adv, jnp.zeros_like(pd_adv)))
            return (d_real + d_fake) * 0.5 + d_aux, (
                {"d_adv_real": d_real, "d_aux_real": d_aux, "d_adv_fake": d_fake},
                m2["batch_stats"])

        d_grads, (dm, d_bs) = jax.grad(d_loss_fn, has_aux=True)(
            d.params, d.batch_stats)
        d = d.apply_gradients(d_grads,
                              new_batch_stats=merge_bs(d.batch_stats, d_bs))

        # ---- G phase
        def g_loss_fn(g_params, g_bs, d_bs):
            preds, mg = g_apply(g_params, g_bs, imgs, y_map)
            pm, pe = preds["masks"], preds["edges"]
            (adv, aux), md = d_apply(
                d.params, d_bs, jnp.concatenate([pm, pe], axis=-1), y_map)
            loss_mask = L.mask_edge_losses(pm, masks) * 10.0
            loss_edge = L.mask_edge_losses(pe, edges) * 10.0
            g_adv = jnp.mean(L.bce(adv, jnp.ones_like(adv))) * 2.0
            g_aux_ce = jnp.mean(L.softmax_cross_entropy(aux, labels))
            # reference bug kept: loss_g_aux = loss_g_adv * 5 (:142)
            g_aux = g_adv * 5.0
            total = loss_edge + loss_mask + g_adv + g_aux
            return total, ({"loss_edge": loss_edge, "loss_mask": loss_mask,
                            "loss_g_adv": g_adv, "loss_g_aux": g_aux,
                            "g_aux_ce": g_aux_ce},
                           mg["batch_stats"], md["batch_stats"])

        g_grads, (gm, g_bs2, d_bs2) = jax.grad(g_loss_fn, has_aux=True)(
            g.params, g.batch_stats, d.batch_stats)
        g = g.apply_gradients(g_grads,
                              new_batch_stats=merge_bs(g.batch_stats, g_bs2))
        d = d.replace(batch_stats=merge_bs(d.batch_stats, d_bs2))

        # ---- Style-encoder phase (against the updated G)
        ref_preds, mg3 = g_apply(g.params, g.batch_stats, imgs, y_map)
        g = g.replace(batch_stats=merge_bs(g.batch_stats, mg3["batch_stats"]))
        ref_masks = jax.lax.stop_gradient(ref_preds["masks"])
        ref_edges = jax.lax.stop_gradient(ref_preds["edges"])

        def s_loss_fn(g_params, g_bs):
            preds, mg = g_apply(g_params, g_bs, imgs, None)
            pm, pe = preds["masks"], preds["edges"]
            loss_mask_ = L.mask_edge_losses(pm, masks)
            loss_edge_ = L.mask_edge_losses(pe, edges)
            loss_embed = (jnp.mean(jnp.abs(pm - ref_masks))
                          + jnp.mean(jnp.abs(pe - ref_edges))) * 2.0
            total = loss_mask_ + loss_edge_ + loss_embed
            return total, ({"loss_embed": loss_embed}, mg["batch_stats"])

        s_grads, (sm, g_bs3) = jax.grad(s_loss_fn, has_aux=True)(
            g.params, g.batch_stats)
        updates, new_s_state = s_tx.update(s_grads, fs.style_opt_state, g.params)
        g = g.replace(params=optax.apply_updates(g.params, updates),
                      batch_stats=merge_bs(g.batch_stats, g_bs3))

        return FontState(g=g, style_opt_state=new_s_state, d=d), {
            **dm, **gm, **sm}

    return train_step
