"""Breakdown profile of the BC train iteration on the real TPU chip.

Times knocked-out variants of the fused step (reference config: 256px, bs32,
256 pts, bf16 conv compute + bf16 refine FC) to attribute the ~57 ms/step
(BENCH_FAMILIES.md) to its stages:

  maskA      stage-A bridge program (backbone+masknet fwd, bit-packed mask)
  fwd        full forward, no gradients
  full       full train step (grads for all 3 losses + Adam)
  no_regress train step with loss_regress dropped  -> no refine/gather backward
  only_regress train step with edge+mask losses dropped
  no_adam    grads only (all losses), no optimizer update

Chained on state per CLAUDE.md benchmarking rules (no unchained dispatch
streams; one sync per measured window).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bc_data import SyntheticBCDataset
from vaeplay_tpu.models.bc import ComposeNet
from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
from vaeplay_tpu.train.steps_bc import BridgeTracer, make_bc_mask_step
from vaeplay_tpu.utils.amp import merge_batch_stats, to_compute, to_f32
from vaeplay_tpu.utils.jitting import jit_init

IMG, BS, MP, STRIDE = 256, 32, 256, 4
CDT = jnp.bfloat16


def build(model, which):
    """which: subset of {"edge", "mask", "regress"}; adam: bool."""

    def loss_fn(params, batch_stats, constants, imgs, contours, bimgs, eimgs,
                tgt_pts, tgt_mask, key_pts, key_mask):
        variables = {"params": to_compute(params, CDT),
                     "batch_stats": to_compute(batch_stats, CDT)}
        if constants:
            variables["constants"] = to_compute(constants, CDT)
        preds, mut = model.apply(
            variables, to_compute(imgs, CDT), train=True,
            contours=contours, mutable=["batch_stats"])
        preds, mut = to_f32(preds), to_f32(mut)
        total = 0.0
        if "edge" in which:
            total += L.mask_edge_losses(preds["edges"], eimgs)
        if "mask" in which:
            total += L.mask_edge_losses(preds["masks"], bimgs)
        if "regress" in which:
            n = preds["contours"].shape[1]
            pm = (jnp.arange(n)[None, :]
                  < preds["contour_counts"][:, None]).astype(jnp.float32)
            total += L.chamfer_pt_regression_loss(
                preds["contours"], pm, preds["contour_regressions"],
                tgt_pts, tgt_mask, key_pts, key_mask)
        return total, merge_batch_stats(batch_stats, mut["batch_stats"], CDT)

    @jax.jit
    def step(state, imgs, pts, counts, bimgs, eimgs,
             tgt_pts, tgt_mask, key_pts, key_mask):
        grads, new_bs = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.constants,
            imgs, (pts, counts), bimgs, eimgs,
            tgt_pts, tgt_mask, key_pts, key_mask)
        return state.apply_gradients(grads, new_batch_stats=new_bs), grads

    @jax.jit
    def grads_only(state, imgs, pts, counts, bimgs, eimgs,
                   tgt_pts, tgt_mask, key_pts, key_mask):
        grads, new_bs = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, state.constants,
            imgs, (pts, counts), bimgs, eimgs,
            tgt_pts, tgt_mask, key_pts, key_mask)
        return state.replace(batch_stats=new_bs), grads

    @jax.jit
    def fwd_only(state, imgs, pts, counts, bimgs, eimgs,
                 tgt_pts, tgt_mask, key_pts, key_mask):
        total, new_bs = loss_fn(
            state.params, state.batch_stats, state.constants,
            imgs, (pts, counts), bimgs, eimgs,
            tgt_pts, tgt_mask, key_pts, key_mask)
        return state.replace(batch_stats=new_bs), total

    return step, grads_only, fwd_only


def timeit(fn, state, args, warmup=2, iters=8):
    """Fetch-synced timing: under axon, block_until_ready returns at enqueue
    time — only fetching real data forces execution (tools/bench_util.py)."""

    def _force(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]

    holder = state
    for _ in range(warmup):
        holder, out = fn(holder, *args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        holder, out = fn(holder, *args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    model = ComposeNet(max_points=MP, refine_fc_dtype="bfloat16")
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], v["batch_stats"],
                              frozen_backbone_adam(1e-4),
                              constants=v.get("constants"))
    b = SyntheticBCDataset(img_size=IMG, max_points=MP).sample_batch(BS)
    base = tuple(jnp.asarray(b[k]) for k in
                 ("imgs", "bimgs", "eimgs", "tgt_pts", "tgt_mask",
                  "key_pts", "key_mask"))
    mask_step = make_bc_mask_step(model, stride=STRIDE, compute_dtype=CDT)
    tracer = BridgeTracer(IMG, STRIDE, MP)
    pts, counts = tracer.trace(mask_step(state, base[0]))
    pts, counts = jnp.asarray(pts), jnp.asarray(counts)
    args = (base[0], pts, counts) + base[1:]

    # stage A timing (chained via a dummy dependency on the packed output's
    # first byte folded into the image batch so XLA cannot overlap iterations)
    def mask_run(st, imgs, *rest):
        packed = mask_step(st, imgs)
        return st, packed

    rows = []
    rows.append(("maskA (bridge stage A)", timeit(mask_run, state, args)))

    full_step, full_grads, full_fwd = build(model, {"edge", "mask", "regress"})
    rows.append(("fwd only (all losses)", timeit(full_fwd, state, args)))
    rows.append(("grads, no Adam", timeit(full_grads, state, args)))
    rows.append(("FULL step", timeit(full_step, state, args)))
    nr_step, _, _ = build(model, {"edge", "mask"})
    rows.append(("step w/o loss_regress", timeit(nr_step, state, args)))
    or_step, _, _ = build(model, {"regress"})
    rows.append(("step only loss_regress", timeit(or_step, state, args)))

    for name, ms in rows:
        print(f"{name:28s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
