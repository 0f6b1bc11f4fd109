"""Fused train step for Style_GAN (reference train_Style_GAN.py:162-281,
the active `train_random_gan` path).

Per iteration (three optimizers, Adam 1e-4):
  E/G phase: g_loss = KL + [BCE(D(x_rec)→1) + CE(type, y)] + L1(x_rec,
  x_target) + [BCE(D(x_gen)→1) + CE]; E steps on ∂g_loss/∂E; then the latent
  cycle loss 0.5*L1(E_new(x_gen).mu, z) is evaluated with the UPDATED encoder
  and G steps on ∂g_loss/∂G + ∂latent/∂G (the reference's retain_graph +
  accumulate ordering, :231-238).
  D phase: BCE/CE on (x_target→real, stop_grad(x_rec)→fake), averaged.
All in one jit program.

The reference also contains a legacy `train_style_transfer` path
(train_Style_GAN.py:39-154) that is never invoked from __main__ (:354), and
whose companion __main__ smoke block calls constructors with stale signatures
(network_Style_GAN.py:232-257 would crash if run) — dead code, intentionally
not reproduced.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState


class StyleGanState(struct.PyTreeNode):
    e: TrainState
    g: TrainState
    d: TrainState


def make_style_gan_train_step(e_model, g_model, d_model, z_dim: int,
                              compute_dtype=None, recorded_noise: bool = False):
    """compute_dtype=bfloat16 runs E/G/D FLOPs in bf16 with f32 master
    params / Adam state / loss math (KL included) (utils/amp.py policy).

    recorded_noise=True returns a step with signature
    (ss, x_target, x_content, labels, eps, z_sample) taking the two noise
    draws (reference train_Style_GAN.py:156-160 reparameterization eps and
    :223 prior sample) as explicit arrays — the deterministic-replay mode the
    trajectory-parity gate uses; default False samples them from the rng arg."""
    from vaeplay_tpu.utils.amp import to_compute, to_f32

    def E(params, x):
        return to_f32(e_model.apply(
            {"params": to_compute(params, compute_dtype)},
            to_compute(x, compute_dtype), train=True))

    def G(params, x_content, z, y, split=None):
        return to_f32(g_model.apply(
            {"params": to_compute(params, compute_dtype)},
            to_compute(x_content, compute_dtype), to_compute(z, compute_dtype),
            y, train=True, split=split))

    def D(params, x, x_content):
        return to_f32(d_model.apply(
            {"params": to_compute(params, compute_dtype)},
            to_compute(x, compute_dtype), to_compute(x_content, compute_dtype),
            train=True))

    def _step(ss: StyleGanState, x_target, x_content, labels, eps, z_sample,
              split=None):
        e, g, d = ss.e, ss.g, ss.d

        # The x_gen branch feeds TWO losses that backprop into G — the
        # adversarial gen_d term (with pre-update params all around) and the
        # latent cycle (whose cotangent is computed with the UPDATED encoder,
        # reference :231-238).  Linearize G at g.params ONCE with jax.vjp;
        # because a vjp is linear in its cotangent, pulling back the SUM of
        # the two x_gen cotangents equals the sum of two separate backward
        # passes — exact same gradients as the literal two-pass form (test:
        # tests/test_style_gan.py::test_vjp_shared_gen_branch_matches_two_pass)
        # for one fewer Generator forward+backward per step (measured bf16
        # 288 → 237 ms/step, f32 429 → 383 at the reference-default bs32).
        x_gen, g_vjp = jax.vjp(
            lambda gp: G(gp, x_content, z_sample, labels, split), g.params)

        def eg_loss(e_params, g_params, x_gen_in):
            mu, logvar = E(e_params, x_target)
            z_enc = eps * jnp.exp(logvar / 2.0) + mu
            x_rec = G(g_params, x_content, z_enc, labels, split)
            rec_valid, rec_type = D(d.params, x_rec, x_content)
            kl = 0.5 * jnp.sum(jnp.exp(logvar) + mu**2 - logvar - 1.0)
            rec_d = (jnp.mean(L.bce(rec_valid, jnp.ones_like(rec_valid)))
                     + jnp.mean(L.softmax_cross_entropy(rec_type, labels)))
            pixel = jnp.mean(jnp.abs(x_rec - x_target))
            gen_valid, gen_type = D(d.params, x_gen_in, x_content)
            gen_d = (jnp.mean(L.bce(gen_valid, jnp.ones_like(gen_valid)))
                     + jnp.mean(L.softmax_cross_entropy(gen_type, labels)))
            total = kl + rec_d + pixel + gen_d
            return total, {
                "g_rec_kl_loss": kl, "g_rec_d_loss": rec_d,
                "g_rec_pixel_loss": pixel, "g_gen_d_loss": gen_d,
                "x_rec": x_rec,
            }

        (eg_grads_e, eg_grads_g, gen_cot), aux = jax.grad(
            eg_loss, argnums=(0, 1, 2), has_aux=True)(
            e.params, g.params, x_gen)
        x_rec = jax.lax.stop_gradient(aux.pop("x_rec"))
        e = e.apply_gradients(eg_grads_e)

        # latent cycle with the UPDATED encoder, grads only into G (:234-238)
        def latent_loss(x_gen_in):
            mu, _ = E(e.params, x_gen_in)
            return jnp.mean(jnp.abs(mu - z_sample)) * 0.5

        lat, lat_cot = jax.value_and_grad(latent_loss)(x_gen)
        (gen_grads,) = g_vjp(gen_cot + lat_cot)
        g_grads = jax.tree_util.tree_map(
            jnp.add, eg_grads_g, gen_grads)
        g = g.apply_gradients(g_grads)

        # ---- D phase (x_rec detached, from the pre-update G forward)
        def d_loss(d_params):
            rv, rt = D(d_params, x_target, x_content)
            fv, ft = D(d_params, x_rec, x_content)
            d_real = (jnp.mean(L.bce(rv, jnp.ones_like(rv)))
                      + jnp.mean(L.softmax_cross_entropy(rt, labels)))
            d_fake = (jnp.mean(L.bce(fv, jnp.zeros_like(fv)))
                      + jnp.mean(L.softmax_cross_entropy(ft, labels)))
            return (d_real + d_fake) * 0.5, (d_real, d_fake)

        d_grads, (d_real, d_fake) = jax.grad(d_loss, has_aux=True)(d.params)
        d = d.apply_gradients(d_grads)

        metrics = {**aux, "loss_latent": lat, "d_real_loss": d_real,
                   "d_fake_loss": d_fake}
        return StyleGanState(e=e, g=g, d=d), metrics

    # `split` is a static argument: batches pre-sorted by label may pass a
    # (k0p, k1p) bucket so the G's gated convs run each branch only on its
    # sub-batch (MyConv2d docstring); each distinct bucket compiles once.
    if recorded_noise:
        @functools.partial(jax.jit, static_argnums=(6,))
        def train_step(ss: StyleGanState, x_target, x_content, labels,
                       eps, z_sample, split=None):
            return _step(ss, x_target, x_content, labels, eps, z_sample, split)
    else:
        @functools.partial(jax.jit, static_argnums=(5,))
        def train_step(ss: StyleGanState, x_target, x_content, labels, rng,
                       split=None):
            b = x_target.shape[0]
            rng_eps, rng_z = jax.random.split(rng)
            eps = jax.random.normal(rng_eps, (b, z_dim))
            z_sample = jax.random.normal(rng_z, (b, z_dim))
            return _step(ss, x_target, x_content, labels, eps, z_sample, split)

    return train_step


def sort_batch_by_label(labels, *arrays, pad: int = 8):
    """Host-side prep for label-bucketed training: stable-sort the batch
    rows label-0-first and return the (k0p, k1p) bucket with each branch
    capacity rounded up to a multiple of `pad` (few distinct buckets → few
    compiled programs) and capped at B.  Losses in the Style_GAN step are
    all batch means/sums, so a consistent permutation of every per-sample
    array leaves the training math unchanged."""
    import numpy as np

    labels = np.asarray(labels)
    order = np.argsort(labels, kind="stable")
    b = labels.shape[0]
    k0 = int(np.count_nonzero(labels == 0))
    k0p = min(b, -(-k0 // pad) * pad)
    k1p = min(b, -(-(b - k0) // pad) * pad)
    return ([np.asarray(a)[order] for a in arrays], labels[order],
            (k0p, k1p))
