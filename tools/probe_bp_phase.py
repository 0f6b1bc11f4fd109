"""Isolate where BP's bf16 phase overhead lives (verdict item 5 follow-up).

tools/profile_bp.py showed the paradox: every BP module gains 20-28% from
bf16 standalone, yet the fused phases gain only 3-9%.  The f32 phase-2 cost
equals its module sum exactly (52.0 vs 52.1 ms) while the bf16 phase carries
+10 ms over its module sum (50.5 vs 40.3 ms).  This probe times phase-2
variants that remove one suspect at a time:

  A. shipped form: f32 master params, cast-inside-loss, Adam update;
  B. no-Adam: same cast, trivial p-1e-30*g update (isolates optimizer);
  C. bf16-resident params, trivial update, loss on bf16 preds (module-style
     ceiling: no casts anywhere);
  D. f32 master + cast, trivial update, loss directly on bf16 preds
     (isolates the to_f32(outputs) cast / f32 loss math);
  E. shipped form but grads pre-cast to bf16 before Adam is impossible
     (Adam state is f32) - instead: Adam over a bf16 param tree.

All scan-amortized + fetch-synced (tools/bench_util.timed_scan).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
from vaeplay_tpu.models.bp import VALUE_WEIGHT, ComposeNet
from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.train.steps_bp import _pt_loss
from vaeplay_tpu.utils.amp import cast_floating, to_compute, to_f32
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("BP_IMG", 512))
BS = int(os.environ.get("BP_BS", 8))
ITERS = int(os.environ.get("BP_ITERS", 20))
CDT = jnp.bfloat16


def main():
    model = ComposeNet(image_size=IMG)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    # timed_scan donates its carry; keep a host-side master so every variant
    # rehydrates a fresh device tree instead of reusing deleted buffers.
    host_params = jax.device_get(v["params"])

    def fresh_params(dtype=None):
        t = jax.device_put(host_params)
        return cast_floating(t, dtype) if dtype is not None else t

    imgs, p1, p2 = SyntheticEmitDataset(img_size=IMG).sample_batch(BS)
    imgs, p1, p2 = jnp.asarray(imgs), jnp.asarray(p1), jnp.asarray(p2)
    p1s = p1.at[:, :4].set(p1[:, :4] * VALUE_WEIGHT)

    def fwd(params, cast_in, f32_out):
        pr = model.apply(
            {"params": to_compute(params, CDT) if cast_in else params},
            to_compute(imgs, CDT), to_compute(p1s, CDT),
            train=True, method=model.emit_line_only)
        return to_f32(pr) if f32_out else pr

    def loss(params, cast_in=True, f32_out=True):
        pt = _pt_loss(fwd(params, cast_in, f32_out), p2)
        return (pt["trig_loss"] + pt["param_loss"]).astype(jnp.float32)

    # A: shipped (f32 master, cast, Adam)
    tx = torch_adam(1e-3)
    state = TrainState.create(model.apply, fresh_params(), None, tx)

    def step_a(st, *_):
        g = jax.grad(loss)(st.params)
        st = st.apply_gradients(g)
        return st, jnp.float32(0)

    dt = timed_scan(step_a, state, (), iters=ITERS)
    print(f"{'A shipped: f32 master + cast + Adam':54s} {dt*1e3:8.2f} ms",
          flush=True)

    # B: f32 master + cast, trivial update
    def step_b(params, *_):
        g = jax.grad(loss)(params)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, g), 0.0

    dt = timed_scan(step_b, fresh_params(), (), iters=ITERS)
    print(f"{'B f32 master + cast, trivial update (no Adam)':54s} {dt*1e3:8.2f} ms",
          flush=True)

    # C: bf16-resident params, no casts, bf16 loss inputs, trivial update
    bp16 = fresh_params(CDT)

    def step_c(params, *_):
        g = jax.grad(lambda p: loss(p, cast_in=False, f32_out=False))(params)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, g), 0.0

    dt = timed_scan(step_c, bp16, (), iters=ITERS)
    print(f"{'C bf16-resident params, no casts, trivial update':54s} {dt*1e3:8.2f} ms",
          flush=True)

    # D: f32 master + cast-in, loss on bf16 preds (no output cast)
    def step_d(params, *_):
        g = jax.grad(lambda p: loss(p, cast_in=True, f32_out=False))(params)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, g), 0.0

    dt = timed_scan(step_d, fresh_params(), (), iters=ITERS)
    print(f"{'D f32 master + cast, bf16 loss, trivial update':54s} {dt*1e3:8.2f} ms",
          flush=True)

    # E: Adam over a bf16-resident tree (no per-step casts, real optimizer)
    state_e = TrainState.create(model.apply, fresh_params(CDT), None, torch_adam(1e-3))

    def step_e(st, *_):
        g = jax.grad(lambda p: loss(p, cast_in=False, f32_out=False))(st.params)
        st = st.apply_gradients(g)
        return st, jnp.float32(0)

    dt = timed_scan(step_e, state_e, (), iters=ITERS)
    print(f"{'E bf16-resident params + Adam (f32 moments)':54s} {dt*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
