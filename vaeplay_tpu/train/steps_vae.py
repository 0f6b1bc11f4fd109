"""Fused train step for the circle VAE-GAN.

One jit-compiled step replaces the reference's per-batch sequence of one
forward + five `backward(retain_graph=True)` + four RMSprop steps
(train.py:43-78).  Loss composition matches train.py:54-66:

  loss_recon         = mean((x - x_tilde)^2)
  loss_encoder       = sum(kl) + sum(mse_layer)
  loss_discriminator = sum(bce_orig) + sum(bce_pred) + sum(bce_sampled)
  loss_decoder       = sum(lambda*mse_layer) - (1-lambda)*loss_discriminator
  loss_aux           = smooth_l1(targets, params, sum)/B       (lambda = 1e-6)

Because torch grad accumulation across the five backwards is additive and each
optimizer reads a disjoint param subset, grad(sum of losses) routed through
per-subset RMSprop transforms reproduces the update exactly.
"""

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState

LAMBDA_MSE = 1e-6  # train.py:15


def vae_gan_losses(outs, imgs, targets) -> Dict[str, jnp.ndarray]:
    x_tilde, disc_class, disc_layer, mus, log_variances, params = outs
    b = imgs.shape[0]
    dl_orig, dl_pred = disc_layer[:b], disc_layer[b : 2 * b]
    dc = disc_class[:, 0]
    dc_orig, dc_pred, dc_samp = dc[:b], dc[b : 2 * b], dc[2 * b :]
    pieces = L.vaegan_losses(
        imgs, x_tilde, dl_orig, dl_pred, dc_orig, dc_pred, dc_samp,
        mus, log_variances, targets, params,
    )
    loss_recon = jnp.mean((imgs - x_tilde) ** 2)
    loss_encoder = jnp.sum(pieces["kl"]) + jnp.sum(pieces["mse"])
    loss_discriminator = (
        jnp.sum(pieces["bce_dis_original"])
        + jnp.sum(pieces["bce_dis_predicted"])
        + jnp.sum(pieces["bce_dis_sampled"])
    )
    loss_decoder = jnp.sum(LAMBDA_MSE * pieces["mse"]) - (1.0 - LAMBDA_MSE) * loss_discriminator
    loss_aux = pieces["l1_param"]
    return {
        "loss_recon": loss_recon,
        "loss_encoder": loss_encoder,
        "loss_decoder": loss_decoder,
        "loss_discriminator": loss_discriminator,
        "loss_aux": loss_aux,
        "kl": jnp.sum(pieces["kl"]),
        "nle": jnp.mean(pieces["nle"]),
    }


def make_train_step(model, compute_dtype=None, remat: bool = False):
    """Returns jit(state, imgs, targets, rng) -> (state, metrics).

    compute_dtype=bfloat16 runs the forward/backward FLOPs in bf16 while
    master params, optimizer state, BN statistics, and all loss reductions
    stay f32 (utils/amp.py policy).

    remat=True wraps the whole training forward in jax.checkpoint, so the
    backward recomputes activations instead of storing them — the memory/
    FLOPs trade for HBM headroom at larger per-chip batches.  Numerics are
    identical (tests/test_vae_gan.py::test_remat_step_matches_plain)."""
    from vaeplay_tpu.utils.amp import merge_batch_stats, to_compute, to_f32

    def fwd(params, batch_stats, imgs, rng):
        return model.apply(
            {"params": to_compute(params, compute_dtype),
             "batch_stats": to_compute(batch_stats, compute_dtype)},
            to_compute(imgs, compute_dtype),
            train=True,
            rngs={"noise": rng},
            mutable=["batch_stats"],
        )

    if remat:
        fwd = jax.checkpoint(fwd)

    def loss_fn(params, batch_stats, imgs, targets, rng):
        outs, mut = fwd(params, batch_stats, imgs, rng)
        m = vae_gan_losses(to_f32(outs), imgs, targets)
        total = (
            m["loss_recon"]
            + m["loss_encoder"]
            + m["loss_decoder"]
            + m["loss_discriminator"]
            + m["loss_aux"]
        )
        return total, (m, merge_batch_stats(batch_stats, mut["batch_stats"],
                                            compute_dtype))

    @jax.jit
    def train_step(state: TrainState, imgs, targets, rng):
        grad_fn = jax.grad(loss_fn, has_aux=True)
        grads, (metrics, new_bs) = grad_fn(
            state.params, state.batch_stats, imgs, targets, rng
        )
        state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return state, metrics

    return train_step


def make_circle_train_step(model, img_size: int, compute_dtype=None,
                           remat: bool = False):
    """Fused data + train step: takes raw (B, 3) [radius, cx, cy] circle params
    and renders the batch, encodes the targets, and runs the train step inside
    ONE jit program — zero host->device image traffic (the reference renders
    every circle on the CPU per sample, datasets/dataset.py:52-56)."""
    from vaeplay_tpu.ops.geometry import encode_circle_param, render_circle_batch

    step = make_train_step(model, compute_dtype=compute_dtype, remat=remat)

    @jax.jit
    def fused(state: TrainState, raw_params, rng):
        r, cx, cy = raw_params[:, 0], raw_params[:, 1], raw_params[:, 2]
        imgs = render_circle_batch(img_size, r, cx, cy)
        enc = encode_circle_param(img_size, r, cx, cy)
        targets = jnp.stack([enc["radius"], enc["x"], enc["y"]], axis=-1)
        return step(state, imgs, targets, rng)

    return fused


def make_eval_step(model):
    @jax.jit
    def eval_step(state: TrainState, imgs, rng):
        x_tilde, params = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs,
            rngs={"noise": rng},
            method=model.reconstruct,
        )
        return x_tilde, params

    return eval_step
