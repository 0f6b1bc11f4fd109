"""Breakdown profile of the Style_GAN train iteration on the real TPU chip.

Attributes the Style_GAN step cost (BENCH_FAMILIES.md: 288 ms/step bf16 at
the reference-default 256px / z512 / bs32, vs a ~84 ms XLA compute floor) to
its phases and submodules:

  1. knocked-out variants of the fused three-optimizer step
     (train/steps_style_gan.py): E/G phase only, latent-cycle only,
     D phase only, G forward only;
  2. standalone fwd+bwd of StyleEncoder / Generator / Discriminator and of
     the z->plane MLP alone (the 371M-param fc stack);
  3. optimizer-update-only cost per net (Adam moment traffic with zero
     grads) — the HBM floor the three Adams add on top of compute.

All timing is scan-amortized + fetch-synced per CLAUDE.md benchmarking rules
(tools/bench_util.timed_scan).  Usage:
  python tools/profile_style_gan.py [phases] [modules] [opt]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vaeplay_tpu.models.style_gan import (
    MLP, Discriminator, Generator, StyleEncoder)
from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.train.steps_style_gan import (
    StyleGanState, make_style_gan_train_step)
from vaeplay_tpu.utils.amp import to_compute, to_f32
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("SG_IMG", 256))
BS = int(os.environ.get("SG_BS", 32))
ZD = int(os.environ.get("SG_Z", 512))
CDT = jnp.bfloat16


def build_states(seed=0):
    e_model = StyleEncoder(z_dim=ZD, image_size=IMG)
    g_model = Generator(image_size=IMG, z_dim=ZD)
    d_model = Discriminator(image_size=IMG, num_classes=2)
    x = jnp.zeros((1, IMG, IMG, 3))
    z = jnp.zeros((1, ZD))
    y0 = jnp.zeros((1,), jnp.int32)
    ev = jit_init(e_model, {"params": jax.random.PRNGKey(seed)}, x)
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(seed + 1)}, x, z, y0)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(seed + 2)}, x, x)
    ss = StyleGanState(
        e=TrainState.create(e_model.apply, ev["params"], None, torch_adam(1e-4)),
        g=TrainState.create(g_model.apply, gv["params"], None, torch_adam(1e-4)),
        d=TrainState.create(d_model.apply, dv["params"], None, torch_adam(1e-4)),
    )
    return e_model, g_model, d_model, ss


def make_partial_step(e_model, g_model, d_model, phases):
    """phases ⊆ {"eg", "latent", "d", "gfwd"} — knocked-out variants of
    make_style_gan_train_step (same math where present)."""

    def E(params, x):
        return to_f32(e_model.apply({"params": to_compute(params, CDT)},
                                    to_compute(x, CDT), train=True))

    def G(params, xc, z, y):
        return to_f32(g_model.apply({"params": to_compute(params, CDT)},
                                    to_compute(xc, CDT), to_compute(z, CDT),
                                    y, train=True))

    def D(params, x, xc):
        return to_f32(d_model.apply({"params": to_compute(params, CDT)},
                                    to_compute(x, CDT), to_compute(xc, CDT),
                                    train=True))

    def train_step(ss, x_target, x_content, labels, rng):
        e, g, d = ss.e, ss.g, ss.d
        b = x_target.shape[0]
        rng_eps, rng_z = jax.random.split(rng)
        z_sample = jax.random.normal(rng_z, (b, ZD))
        x_rec = x_target
        metric = 0.0

        if "eg" in phases:
            def eg_loss(e_params, g_params):
                mu, logvar = E(e_params, x_target)
                eps = jax.random.normal(rng_eps, mu.shape)
                z_enc = eps * jnp.exp(logvar / 2.0) + mu
                xr = G(g_params, x_content, z_enc, labels)
                rv, rt = D(d.params, xr, x_content)
                kl = 0.5 * jnp.sum(jnp.exp(logvar) + mu**2 - logvar - 1.0)
                rec_d = (jnp.mean(L.bce(rv, jnp.ones_like(rv)))
                         + jnp.mean(L.softmax_cross_entropy(rt, labels)))
                pixel = jnp.mean(jnp.abs(xr - x_target))
                xg = G(g_params, x_content, z_sample, labels)
                gv, gt = D(d.params, xg, x_content)
                gen_d = (jnp.mean(L.bce(gv, jnp.ones_like(gv)))
                         + jnp.mean(L.softmax_cross_entropy(gt, labels)))
                return kl + rec_d + pixel + gen_d, xr

            (ge, gg), xr = jax.grad(eg_loss, argnums=(0, 1), has_aux=True)(
                e.params, g.params)
            x_rec = jax.lax.stop_gradient(xr)
            e = e.apply_gradients(ge)
            g = g.apply_gradients(gg)
            metric = jax.tree_util.tree_leaves(gg)[0].sum()

        if "latent" in phases:
            def latent_loss(g_params):
                xg = G(g_params, x_content, z_sample, labels)
                mu, _ = E(e.params, xg)
                return jnp.mean(jnp.abs(mu - z_sample)) * 0.5

            lat, lg = jax.value_and_grad(latent_loss)(g.params)
            g = g.apply_gradients(lg)
            metric = lat

        if "d" in phases:
            def d_loss(d_params):
                rv, rt = D(d_params, x_target, x_content)
                fv, ft = D(d_params, x_rec, x_content)
                return 0.5 * (
                    jnp.mean(L.bce(rv, jnp.ones_like(rv)))
                    + jnp.mean(L.softmax_cross_entropy(rt, labels))
                    + jnp.mean(L.bce(fv, jnp.zeros_like(fv)))
                    + jnp.mean(L.softmax_cross_entropy(ft, labels)))

            dg = jax.grad(d_loss)(d.params)
            d = d.apply_gradients(dg)
            metric = jax.tree_util.tree_leaves(dg)[0].sum()

        if "gfwd" in phases:
            xg = G(g.params, x_content, z_sample, labels)
            metric = xg.sum()
            g = g.replace(params=jax.tree_util.tree_map(
                lambda p: p - 1e-30 * metric.astype(p.dtype), g.params))

        return StyleGanState(e=e, g=g, d=d), metric

    return train_step


def module_fwd_bwd(mod, args, iters=20, label=""):
    v = jit_init(mod, {"params": jax.random.PRNGKey(0)}, *args)

    def loss(params):
        out = mod.apply({"params": to_compute(params, CDT)},
                        *[to_compute(a, CDT) for a in args], train=True)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(out))

    def step(params):
        l, gr = jax.value_and_grad(loss)(params)
        return jax.tree_util.tree_map(lambda p, g: p - 1e-30 * g, params, gr), l

    dt = timed_scan(lambda s: step(s), v["params"], (), iters=iters)
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return dt


def opt_only(state, label, iters=50):
    """Adam update with zero grads: pure optimizer HBM traffic."""
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    def step(st):
        st = st.apply_gradients(zeros)
        return st, jax.tree_util.tree_leaves(st.params)[0].sum()

    dt = timed_scan(step, state, (), iters=iters)
    n = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"{label:44s} {dt*1e3:8.2f} ms   ({n/1e6:.0f}M params)")
    return dt


def main():
    only = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    x_target = jnp.asarray(rng.normal(size=(BS, IMG, IMG, 3)).astype(np.float32))
    x_content = jnp.asarray(rng.normal(size=(BS, IMG, IMG, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, size=(BS,)), jnp.int32)
    args = (x_target, x_content, labels, jax.random.PRNGKey(7))

    if not only or "phases" in only:
        e_model, g_model, d_model, ss = build_states()
        full = make_style_gan_train_step(e_model, g_model, d_model, ZD,
                                         compute_dtype=CDT)
        dt = timed_scan(full, ss, args, iters=20)
        print(f"{'FULL step (bf16)':44s} {dt*1e3:8.2f} ms")
        for name, phases in (("E/G phase only", {"eg"}),
                             ("latent cycle only", {"latent"}),
                             ("D phase only", {"d"}),
                             ("G forward only", {"gfwd"})):
            _, _, _, ss2 = build_states()
            st = make_partial_step(e_model, g_model, d_model, phases)
            dt = timed_scan(st, ss2, args, iters=20)
            print(f"{name:44s} {dt*1e3:8.2f} ms")

    if not only or "modules" in only:
        z = jnp.zeros((BS, ZD))
        module_fwd_bwd(StyleEncoder(z_dim=ZD, image_size=IMG), (x_target,),
                       label="StyleEncoder fwd+bwd")
        module_fwd_bwd(Generator(image_size=IMG, z_dim=ZD),
                       (x_content, z, labels), label="Generator fwd+bwd")
        module_fwd_bwd(Discriminator(image_size=IMG, num_classes=2),
                       (x_target, x_content), label="Discriminator fwd+bwd")
        mlp = MLP(ZD, IMG * IMG, 3)
        v = jit_init(mlp, {"params": jax.random.PRNGKey(0)}, z)

        def mstep(params):
            def loss(p):
                out = mlp.apply({"params": to_compute(p, CDT)},
                                to_compute(z, CDT))
                return jnp.sum(jnp.square(out.astype(jnp.float32)))
            l, gr = jax.value_and_grad(loss)(params)
            return jax.tree_util.tree_map(lambda p, g: p - 1e-30 * g,
                                          params, gr), l

        dt = timed_scan(lambda s: mstep(s), v["params"], (), iters=20)
        print(f"{'z->plane MLP (371M fc) fwd+bwd':44s} {dt*1e3:8.2f} ms")

    if not only or "opt" in only:
        _, _, _, ss = build_states()
        opt_only(ss.e, "Adam update only: E")
        opt_only(ss.g, "Adam update only: G (incl. 371M MLP)")
        opt_only(ss.d, "Adam update only: D")


if __name__ == "__main__":
    main()
