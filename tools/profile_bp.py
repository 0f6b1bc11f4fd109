"""Breakdown profile of the BP train iteration on the real TPU chip.

Round-2 verdict item: BP gains only ~7% from bf16 (128.97 -> 119.60 ms/step
at the reference-default 512px / bs8 / 720 pts) vs 20-40% on every other
family.  This attributes the step cost two ways, each timed in BOTH f32 and
bf16 so the dtype-insensitive stage is directly visible:

  1. knocked-out variants of the fused two-phase step
     (train/steps_bp.make_bp_train_step): phase-1 only, phase-2 only,
     full-model forward only;
  2. standalone fwd+bwd of each submodule at BP shapes: ContentEndoer
     (stage-1 encoder), the EmitLinePredictor conv pyramid alone, the
     ValueEncoder + attention towers (the 9 position-over-embedding
     self-attention sites), the trigger/param dense heads, and the raw
     point_sample_ng 720-pt gather.

All timing is scan-amortized + fetch-synced per CLAUDE.md benchmarking rules
(tools/bench_util.timed_scan).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
from vaeplay_tpu.models.bp import (
    SAMPLE_COUNT, VALUE_WEIGHT, ComposeNet, ContentEndoer,
    EmitLineParamPredictor, EmitLinePredictor, ValueEncoder)
from vaeplay_tpu.ops.image import point_sample_ng
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.utils.amp import to_compute, to_f32
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("BP_IMG", 512))
BS = int(os.environ.get("BP_BS", 8))
S = SAMPLE_COUNT  # 720
ITERS = int(os.environ.get("BP_ITERS", 20))


def module_fwd_bwd(mod, init_args, args, cdt, iters=ITERS, label="",
                   method=None):
    v = jit_init(mod, {"params": jax.random.PRNGKey(0)}, *init_args,
                 **({"method": method} if method else {}))

    def loss(params):
        kw = {"method": method} if method else {}
        out = mod.apply({"params": to_compute(params, cdt)},
                        *[to_compute(a, cdt) for a in args], train=True, **kw)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)

    def step(params, *_):
        l, g = jax.value_and_grad(loss)(params)
        new = jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, g)
        return new, l

    dt = timed_scan(step, v["params"], (), iters=iters)
    print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def build_state():
    model = ComposeNet(image_size=IMG)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    return model, TrainState.create(model.apply, v["params"], None,
                                    torch_adam(1e-4))


def make_partial_step(model, phases, cdt):
    """phases ⊆ {"p1", "p2", "fwd"} — knocked-out variants of
    train/steps_bp.make_bp_train_step (same math where present)."""
    from vaeplay_tpu.ops import losses as L
    from vaeplay_tpu.train.steps_bp import _pt_loss

    def loss_phase1(params, imgs, p1_targets, p2_targets):
        preds = to_f32(model.apply({"params": to_compute(params, cdt)},
                                   to_compute(imgs, cdt), train=True))
        el = L.ellipse_param_loss(preds["ellipse_params"], p1_targets)
        pt = _pt_loss(preds, p2_targets)
        return (el["loss_cx"] + el["loss_cy"] + el["loss_rest"]
                + pt["trig_loss"] + pt["param_loss"])

    def loss_phase2(params, imgs, p1_scaled, p2_targets):
        preds = to_f32(model.apply(
            {"params": to_compute(params, cdt)},
            to_compute(imgs, cdt), p1_scaled,
            train=True, method=model.emit_line_only))
        pt = _pt_loss(preds, p2_targets)
        return pt["trig_loss"] + pt["param_loss"]

    def train_step(state, imgs, p1_targets, p2_targets):
        metric = 0.0
        if "p1" in phases:
            grads = jax.grad(loss_phase1)(state.params, imgs, p1_targets,
                                          p2_targets)
            state = state.apply_gradients(grads)
            metric = jax.tree_util.tree_leaves(grads)[0].sum()
        if "p2" in phases:
            p1_scaled = p1_targets.at[:, :4].set(p1_targets[:, :4] * VALUE_WEIGHT)
            grads = jax.grad(loss_phase2)(state.params, imgs, p1_scaled,
                                          p2_targets)
            state = state.apply_gradients(grads)
            metric = jax.tree_util.tree_leaves(grads)[0].sum()
        if "fwd" in phases:
            preds = to_f32(model.apply(
                {"params": to_compute(state.params, cdt)},
                to_compute(imgs, cdt), train=True))
            metric = preds["line_params"].sum()
            state = state.replace(params=jax.tree_util.tree_map(
                lambda p: p - 1e-30 * metric.astype(p.dtype), state.params))
        return state, metric

    return train_step


def run_dtype(cdt, name, only):
    print(f"--- compute dtype {name} ---", flush=True)
    imgs, p1, p2 = SyntheticEmitDataset(img_size=IMG).sample_batch(BS)
    args = (jnp.asarray(imgs), jnp.asarray(p1), jnp.asarray(p2))

    if not only or "phases" in only:
        from vaeplay_tpu.train.steps_bp import make_bp_train_step
        model, state = build_state()
        full = make_bp_train_step(model, compute_dtype=cdt)
        dt = timed_scan(full, state, args, iters=ITERS)
        print(f"{'FULL step (2 phases)':52s} {dt*1e3:8.2f} ms", flush=True)
        for label, phases in (("phase 1 only (full model fwd+bwd)", {"p1"}),
                              ("phase 2 only (emit-line fwd+bwd)", {"p2"}),
                              ("full-model forward only", {"fwd"})):
            model2, state2 = build_state()
            st = make_partial_step(model2, phases, cdt)
            dt = timed_scan(st, state2, args, iters=ITERS)
            print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)

    if not only or "modules" in only:
        x = args[0]
        module_fwd_bwd(ContentEndoer(), (x,), (x,), cdt,
                       label="ContentEndoer (stage-1 encoder) fwd+bwd")

        # conv pyramid alone: EmitLinePredictor truncated before the gather —
        # approximate by a pyramid-only module
        from flax import linen as nn
        from vaeplay_tpu.core.layers import ConvBlock

        class PyramidOnly(nn.Module):
            channels: tuple = EmitLinePredictor.channels

            @nn.compact
            def __call__(self, x, train=True):
                for i, (c, s) in enumerate(self.channels):
                    x = ConvBlock(c, 3, stride=s, activate="lrelu",
                                  name=f"conv{i}")(x, train=train)
                return x

        module_fwd_bwd(PyramidOnly(), (x,), (x,), cdt,
                       label="EmitLine conv pyramid (7 convs to 2048ch)")

        feat = jnp.zeros((BS, IMG // 32, IMG // 32, 2048))
        grid = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (BS, S, 2)).astype(np.float32))

        def gather_step(f, *_):
            def loss(ff):
                out = point_sample_ng(to_compute(ff, cdt),
                                      to_compute(grid, cdt), False, "bilinear")
                return jnp.sum(jnp.square(out.astype(jnp.float32)))
            l, g = jax.value_and_grad(loss)(f)
            return f - 1e-30 * g, l

        dt = timed_scan(gather_step, feat, (), iters=ITERS)
        print(f"{'point_sample_ng 720pt fwd+bwd':52s} {dt*1e3:8.2f} ms",
              flush=True)

        embed = jnp.zeros((BS, S, 8))
        module_fwd_bwd(ValueEncoder(2048), (embed,), (embed,), cdt,
                       label="ValueEncoder (MLP + 3 attn @ N=2048,C=720)")

        featp = jnp.zeros((BS, S, 2048))
        sample = jnp.zeros((BS, S, 6))
        params5 = jnp.zeros((BS, 5)).at[:, 4].set(4.0)
        module_fwd_bwd(EmitLineParamPredictor(2048),
                       (featp, sample, params5), (featp, sample, params5), cdt,
                       label="EmitLineParamPredictor (VE + 2 towers + heads)")


def main():
    only = set(a for a in sys.argv[1:] if a in ("phases", "modules"))
    dtypes = [d for d in sys.argv[1:] if d in ("f32", "bf16")] or ["bf16", "f32"]
    for d in dtypes:
        run_dtype(jnp.bfloat16 if d == "bf16" else None, d, only)


if __name__ == "__main__":
    main()
