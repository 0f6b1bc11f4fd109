"""Compiled-step cost analysis — roofline cross-check for BENCH_FAMILIES.md.

Asks XLA what the compiled program actually contains (flops, bytes accessed)
via `step.lower(...).compile().cost_analysis()` and derives roofline-bound
time estimates at the measured chip rates (tools/roofline.py), so measured
ms/step numbers can be judged against physics instead of vibes.

Any benchmark family (tools/bench_families.BUILDERS) can be analyzed; the
default is the headline VAE-GAN step with explicit --dtype/--batch control.
Compiling for the TPU backend costs one (slow) tunnel compile and zero
execution.

Usage: python tools/step_cost.py [--dtype bf16] [--batch 128]
       python tools/step_cost.py --family be_gan
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# Measured on this chip (tools/roofline.py, v5e via the axon tunnel).
BF16_TFLOPS = 134.0
F32_TFLOPS = 22.0
HBM_GBPS = 600.0


def report(compileds, batch: int, peak_tflops: float) -> None:
    """compileds: one compiled program or a list (multi-program steps sum)."""
    if not isinstance(compileds, (list, tuple)):
        compileds = [compileds]
    flops = bytes_acc = 0.0
    for compiled in compileds:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops += ca.get("flops", 0.0)
        bytes_acc += ca.get("bytes accessed", 0.0)
    t_flops = flops / (peak_tflops * 1e12)
    t_hbm = bytes_acc / (HBM_GBPS * 2**30)
    print(f"flops/step:          {flops / 1e12:.3f} TFLOP")
    print(f"bytes accessed/step: {bytes_acc / 2**30:.2f} GiB")
    print(f"roofline floor:      compute {t_flops * 1e3:.1f} ms | "
          f"memory {t_hbm * 1e3:.1f} ms | bound = {max(t_flops, t_hbm) * 1e3:.1f} ms")
    print(f"  ({batch} imgs -> speed-of-light "
          f"{batch / max(t_flops, t_hbm):.0f} img/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img_size", type=int, default=256)
    ap.add_argument("--family", default=None,
                    help="a tools/bench_families.BUILDERS key; overrides the "
                         "--dtype/--batch VAE-GAN default")
    args = ap.parse_args()

    if args.family:
        from tools.bench_families import BUILDERS

        label, step, state, step_args, _, bs = BUILDERS[args.family]()
        # Per-family scan iters divide FLOPs evenly, so analyze one raw step.
        if hasattr(step, "lower"):
            compiled = step.lower(state, *step_args).compile()
        else:
            # split multi-program steps (be_gan) expose their jitted phases
            phases = [step.d_phase, step.g_phase]
            compiled = [p.lower(state, *step_args).compile() for p in phases]
        # bf16 rows are bound by the bf16 matmul rate; the amortized scan
        # keeps everything else identical.
        peak = BF16_TFLOPS if "bf16" in label else F32_TFLOPS
        print(label)
        report(compiled, bs, peak)
        return

    from vaeplay_tpu.models.vae_gan import VaeGan
    from vaeplay_tpu.train.state import TrainState, grouped_transform, torch_rmsprop
    from vaeplay_tpu.train.steps_vae import make_circle_train_step
    from vaeplay_tpu.utils.jitting import jit_init

    dt = jnp.bfloat16 if args.dtype == "bf16" else None
    model = VaeGan(img_size=args.img_size, z_size=128)
    x = jnp.zeros((2, args.img_size, args.img_size, 1))
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
    step = make_circle_train_step(model, args.img_size, compute_dtype=dt)

    pb = jnp.zeros((args.batch, 3))
    compiled = step.lower(state, pb, jax.random.PRNGKey(2)).compile()
    print(f"dtype={args.dtype} bs={args.batch} {args.img_size}px")
    report(compiled, args.batch,
           BF16_TFLOPS if args.dtype == "bf16" else F32_TFLOPS)


if __name__ == "__main__":
    main()
