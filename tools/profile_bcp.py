"""Breakdown profile of the BCP train iteration on the real TPU chip.

Attributes the BCP step cost (BENCH_FAMILIES.md: 85 ms/step bf16 at the
reference-default 512px / bs16 / 2048 pts, vs a 24 ms XLA compute floor) to
its stages, two ways:

  1. knocked-out variants of the fused two-phase step (D phase only,
     G phase only, G forward only);
  2. standalone fwd+bwd of each submodule (ContentEndoer towers,
     ClassPredictor, LinePredictor, Discriminator) plus the raw
     grid_sample gather fwd+bwd at BCP shapes (scatter backward vs the
     scatter-free point_sample_ng dense backward).

All timing is scan-amortized + fetch-synced per CLAUDE.md benchmarking rules
(tools/bench_util.timed_scan).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
from vaeplay_tpu.models.bcp import (
    ClassPredictor, ComposeNet, ContentEndoer, Discriminator, LinePredictor,
    VALUE_WEIGHT)
from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.ops.image import grid_sample, point_sample_ng
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.train.steps_be_gan import GanState
from vaeplay_tpu.utils.amp import to_compute, to_f32
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("BCP_IMG", 512))
BS = int(os.environ.get("BCP_BS", 16))
P = int(os.environ.get("BCP_P", 2048))
CDT = jnp.bfloat16


def module_fwd_bwd(mod, init_args, args, iters=30, label=""):
    """Time fwd+bwd of a standalone module with a sum-of-squares loss,
    chained through an SGD-ish carry (scale small, not 0 — XLA DCEs *0)."""
    v = jit_init(mod, {"params": jax.random.PRNGKey(0)}, *init_args)

    def loss(params):
        out = mod.apply({"params": to_compute(params, CDT)},
                        *[to_compute(a, CDT) for a in args], train=True)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)

    def step(params):
        l, g = jax.value_and_grad(loss)(params)
        new = jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, g)
        return new, l

    dt = timed_scan(lambda s: step(s), v["params"], (), iters=iters)
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return dt


def gather_fwd_bwd(fn, feat, grid, iters=30, label=""):
    def loss(f):
        out = fn(f, grid)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def step(f):
        l, g = jax.value_and_grad(loss)(f)
        return f - 1e-30 * g, l

    dt = timed_scan(lambda s: step(s), feat, (), iters=iters)
    print(f"{label:44s} {dt*1e3:8.2f} ms")
    return dt


def build_states():
    g_model = ComposeNet(image_size=IMG, pt_size=P)
    d_model = Discriminator(image_size=IMG, pt_size=P)
    x = jnp.zeros((1, IMG, IMG, 3))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x,
                  jnp.zeros((1, P, 2)), jnp.ones((1,), jnp.int32))
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, x,
                  jnp.zeros((1, P, 4)))
    gs = GanState(
        g=TrainState.create(g_model.apply, gv["params"], None, torch_adam(1e-3)),
        d=TrainState.create(d_model.apply, dv["params"], None, torch_adam(1e-3)),
    )
    return g_model, d_model, gs


def make_partial_step(g_model, d_model, phases):
    """phases ⊆ {"d", "g", "gfwd"} — knocked-out variants of
    train/steps_bcp.make_bcp_train_step (same math where present)."""

    def g_forward(params, imgs, contours, counts):
        return to_f32(g_model.apply(
            {"params": to_compute(params, CDT)},
            to_compute(imgs, CDT), to_compute(contours, CDT),
            counts, train=True))

    def d_forward(params, imgs, targets):
        return to_f32(d_model.apply(
            {"params": to_compute(params, CDT)},
            to_compute(imgs, CDT), to_compute(targets, CDT), train=True))

    def train_step(gs, imgs, labels, points, pmask):
        g, d = gs.g, gs.d
        counts = jnp.sum(pmask, axis=1).astype(jnp.int32)
        contours = points[..., :2] * pmask[..., None]
        valid3 = pmask[..., None]
        metric = 0.0

        if "d" in phases:
            preds = g_forward(g.params, imgs, contours, counts)
            fake_targets = jax.lax.stop_gradient(
                jnp.concatenate(
                    [contours * VALUE_WEIGHT, preds["target_pts"]], axis=-1
                ) * valid3)
            real_targets = points[..., :4] * VALUE_WEIGHT * valid3

            def d_loss_fn(d_params):
                real_out = d_forward(d_params, imgs, real_targets)
                fake_out = d_forward(d_params, imgs, fake_targets)
                return 0.5 * (jnp.mean(L.bce(real_out, jnp.ones_like(real_out), eps=1e-12))
                              + jnp.mean(L.bce(fake_out, jnp.zeros_like(fake_out), eps=1e-12)))

            d_grads = jax.grad(d_loss_fn)(d.params)
            d = d.apply_gradients(d_grads)
            metric = jax.tree_util.tree_leaves(d_grads)[0].sum()

        if "g" in phases:
            def g_loss_fn(g_params):
                preds = g_forward(g_params, imgs, contours, counts)
                gt_off = points[..., 2:4] * VALUE_WEIGHT
                diff = jnp.abs(preds["target_pts"] - gt_off)
                total = (jnp.mean(L.softmax_cross_entropy(preds["classes"], labels))
                         + L.masked_mean(diff, pmask[..., None]) * 10.0)
                fake = jnp.concatenate(
                    [contours * VALUE_WEIGHT, preds["target_pts"]], axis=-1
                ) * valid3
                adv = d_forward(d.params, imgs, fake)
                return total + jnp.mean(L.bce(adv, jnp.ones_like(adv), eps=1e-12))

            g_grads = jax.grad(g_loss_fn)(g.params)
            g = g.apply_gradients(g_grads)
            metric = jax.tree_util.tree_leaves(g_grads)[0].sum()

        if "gfwd" in phases:
            preds = g_forward(g.params, imgs, contours, counts)
            metric = preds["target_pts"].sum()
            g = g.replace(params=jax.tree_util.tree_map(
                lambda p: p - 1e-30 * metric.astype(p.dtype), g.params))

        return GanState(g=g, d=d), metric

    return train_step


def main():
    only = set(sys.argv[1:])
    b = SyntheticBCPDataset(img_size=IMG, max_points=P).sample_batch(BS)
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["points"]), jnp.asarray(b["pmask"]))

    if not only or "phases" in only:
        g_model, d_model, gs = build_states()
        from vaeplay_tpu.train.steps_bcp import make_bcp_train_step
        full = make_bcp_train_step(g_model, d_model, compute_dtype=CDT)
        dt = timed_scan(full, gs, args, iters=20)
        print(f"{'FULL step (bf16)':44s} {dt*1e3:8.2f} ms")
        for name, phases in (("D phase only (incl. G fwd)", {"d"}),
                             ("G phase only (fwd+bwd+adv)", {"g"}),
                             ("G forward only", {"gfwd"})):
            _, _, gs2 = build_states()
            st = make_partial_step(g_model, d_model, phases)
            dt = timed_scan(st, gs2, args, iters=20)
            print(f"{name:44s} {dt*1e3:8.2f} ms")

    if not only or "modules" in only:
        fs = IMG // 4  # ContentEndoer output spatial size
        imgs5 = jnp.concatenate(
            [args[0], jnp.zeros((BS, IMG, IMG, 2))], axis=-1)  # + coords
        module_fwd_bwd(ContentEndoer(out_size=fs), (imgs5,), (imgs5,),
                       label="ContentEndoer (dual towers) fwd+bwd")
        feat = jnp.zeros((BS, fs, fs, 128))
        module_fwd_bwd(ClassPredictor(in_size=fs), (feat,), (feat,),
                       label="ClassPredictor fwd+bwd")
        pts = jnp.asarray(b["points"][..., :2])
        cnts = jnp.full((BS,), P, jnp.int32)
        cls = jnp.zeros((BS, 2))
        module_fwd_bwd(LinePredictor(image_size=fs, pt_size=P, in_channels=128),
                       (feat, pts, cnts, cls), (feat, pts, cnts, cls),
                       label="LinePredictor fwd+bwd")
        module_fwd_bwd(Discriminator(image_size=IMG, pt_size=P),
                       (args[0], jnp.zeros((BS, P, 4))),
                       (args[0], jnp.zeros((BS, P, 4))),
                       label="Discriminator fwd+bwd")

    if not only or "gather" in only:
        # timed_scan donates its carry — build a fresh feat per variant
        grid = jnp.asarray(b["points"][..., :2], CDT)
        gather_fwd_bwd(lambda f, g: grid_sample(f, g, align_corners=False),
                       jnp.zeros((BS, IMG // 4, IMG // 4, 128), CDT),
                       grid, label="grid_sample 2048pt fwd+bwd (scatter)")
        gather_fwd_bwd(lambda f, g: point_sample_ng(f, g, False, "bilinear"),
                       jnp.zeros((BS, IMG // 4, IMG // 4, 128), CDT),
                       grid, label="point_sample_ng 2048pt fwd+bwd (dense)")


if __name__ == "__main__":
    main()
