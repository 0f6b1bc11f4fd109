"""Headline benchmark: images/sec/chip for the circle VAE-GAN fused train step
at 256px (the driver-defined metric, BASELINE.json).

Runs the full training computation — on-device circle rendering, encoder/
decoder/discriminator/aux forward, all five reference loss heads, gradients,
and four RMSprop updates — as one jit-compiled XLA program on the default
backend, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline compares against the measured CPU PyTorch reference throughput for
the identical workload (tools/measure_baseline.py; see BASELINE.md).
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.circles import CircleDataset
from vaeplay_tpu.models.vae_gan import VaeGan
from vaeplay_tpu.train.state import TrainState, grouped_transform, torch_rmsprop
from vaeplay_tpu.train.steps_vae import make_circle_train_step
from vaeplay_tpu.utils.jitting import jit_init

# Measured via `python tools/measure_baseline.py --img_size 256 --batch 16
# --steps 3` on an otherwise-idle box (torch 5-backward reference step at the
# reference's default batch 16, train.py:119: 201.3 s/step → 0.079 img/s;
# bs8 on the same box measures 0.080 — throughput is batch-insensitive on
# CPU).  See BASELINE.md for methodology.
BASELINE_CPU_IPS = 0.079

IMG_SIZE = 256
# bs128 saturates the chip; bs256 exceeds HBM at f32 without --remat.
BATCH = 128
STEPS = 50  # one scanned program; large K amortizes the ~8-40ms program cost
# bf16 mixed precision (bf16 FLOPs, f32 master params / optimizer / BN stats /
# loss accumulation — utils/amp.py) is the production mode on TPU and is
# parity-gated by tests/test_bf16.py.  The step is compute-bound: XLA's own
# cost_analysis reports 40.3 TFLOP/step, so the measured ~359 ms/step runs at
# ~84% of the chip's measured 134 TFLOP/s bf16 roofline (tools/roofline.py,
# tools/step_cost.py); f32 measures ~453 ms (~282 img/s).
COMPUTE_DTYPE = jnp.bfloat16


def main():
    model = VaeGan(img_size=IMG_SIZE, z_size=128)
    x = jnp.zeros((2, IMG_SIZE, IMG_SIZE, 1))
    variables = jit_init(
        model, {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x
    )
    tx = grouped_transform(
        {k: torch_rmsprop(1e-4) for k in
         ("encoder", "decoder", "discriminator", "param_encoder")},
        variables["params"],
    )
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    step = make_circle_train_step(model, IMG_SIZE, compute_dtype=COMPUTE_DTYPE)

    ds = CircleDataset(n=IMG_SIZE, min_radius=10, data_size=BATCH * STEPS, seed=0)
    batches = jnp.asarray(np.stack(list(ds.epoch_batches(BATCH))))  # (STEPS, BS, 3)
    rng = jax.random.PRNGKey(2)

    # Timing discipline (tools/bench_util.py): under the axon runtime,
    # block_until_ready returns at ENQUEUE time and every dispatched program
    # pays ~8-40 ms of tunnel latency, so a host-side step loop measures the
    # tunnel, not the chip.  The whole measured epoch therefore runs as ONE
    # jit program — lax.scan over the pre-staged per-step param batches (the
    # circle images themselves are rendered on device inside the step) — and
    # the window is bounded by real data fetches, which cannot lie.
    def body(carry, pb):
        st, r = carry
        r, sub = jax.random.split(r)
        st, metrics = step(st, pb, sub)
        return (st, r), metrics["loss_recon"]

    @partial(jax.jit, donate_argnums=(0,))
    def run_epoch(st, r, pbs):
        (st, r), losses = jax.lax.scan(body, (st, r), pbs)
        return st, losses[-1]

    state, last = run_epoch(state, rng, batches)   # compile + warmup epoch
    np.asarray(last)
    t0 = time.perf_counter()
    state, last = run_epoch(state, rng, batches)
    np.asarray(last)
    dt = time.perf_counter() - t0

    ips = STEPS * BATCH / dt
    print(json.dumps({
        "metric": (f"images/sec/chip (VAE-GAN fused train step, 256px, "
                   f"bs{BATCH}, bf16 mixed precision)"),
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_CPU_IPS, 1),
    }))


if __name__ == "__main__":
    main()
