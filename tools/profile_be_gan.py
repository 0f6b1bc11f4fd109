"""Breakdown profile of the BE_GAN train iteration on the real TPU chip.

Round-2 verdict: BE_GAN sits at ~33% MXU utilization (112 ms bf16 vs a 37 ms
compute floor at 512px/bs16).  Attributes the step cost two ways:

  1. phase timing of the shipped two-program step
     (train/steps_be_gan.make_be_gan_train_step exposes .d_phase/.g_phase);
  2. standalone fwd+bwd of each module at BE_GAN shapes: the G ComposeNet
     (ResNet50-FPN + aux chain + heads), the backbone alone, the
     Discriminator (content+boundary MaskMapper pair), and one MaskMapper.

Per step the G runs 2 fwd + 1 bwd and the D 4 fwd + ~2 bwd (see
steps_be_gan.py docstring), so module rows scale accordingly.

All timing is scan-amortized + fetch-synced per CLAUDE.md benchmarking rules
(tools/bench_util.timed_scan).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
from vaeplay_tpu.models.be_gan import ComposeNet, Discriminator, MaskMapper
from vaeplay_tpu.models.backbone import ResNetFPN
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam, torch_adam
from vaeplay_tpu.train.steps_be_gan import GanState, make_be_gan_train_step
from vaeplay_tpu.utils.amp import to_compute
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("BEGAN_IMG", 512))
BS = int(os.environ.get("BEGAN_BS", 16))
ITERS = int(os.environ.get("BEGAN_ITERS", 20))
CDT = jnp.bfloat16


def module_fwd_bwd(mod, args, label, iters=ITERS, train=True,
                   takes_train=True):
    v = jit_init(mod, {"params": jax.random.PRNGKey(0)}, *args)

    def loss(params):
        variables = {"params": to_compute(params, CDT)}
        for col in ("batch_stats", "constants"):
            if col in v:
                variables[col] = to_compute(v[col], CDT)
        out = mod.apply(variables, *[to_compute(a, CDT) for a in args],
                        **({"train": train} if takes_train else {}),
                        **({"mutable": ["batch_stats"]}
                           if "batch_stats" in v else {}))
        if "batch_stats" in v:
            out = out[0]
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)

    def step(params, *_):
        l, g = jax.value_and_grad(loss)(params)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, g), l

    dt = timed_scan(step, v["params"], (), iters=iters)
    print(f"{label:56s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def build_states():
    g_model = ComposeNet()
    d_model = Discriminator(in_size=IMG)
    x = jnp.zeros((1, IMG, IMG, 3))
    m = jnp.zeros((1, IMG, IMG, 1))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, x, m, m)
    g = TrainState.create(g_model.apply, gv["params"], gv["batch_stats"],
                          frozen_backbone_adam(1e-4),
                          constants=gv.get("constants"))
    d = TrainState.create(d_model.apply, dv["params"], dv["batch_stats"],
                          torch_adam(1e-5, betas=(0.5, 0.999)))
    return g_model, d_model, GanState(g=g, d=d)


def run_phases():
    print(f"--- phases (bf16, {IMG}px bs{BS}) ---", flush=True)
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(BS)
    args = tuple(jnp.asarray(b[k]) for k in ("imgs", "bimgs", "eimgs", "labels"))
    g_model, d_model, gs = build_states()
    step = make_be_gan_train_step(g_model, d_model, compute_dtype=CDT)
    dt = timed_scan(step, gs, args, iters=ITERS)
    print(f"{'FULL step (D phase + G phase)':56s} {dt*1e3:8.2f} ms", flush=True)
    for label, phase in (("D phase (G fwd + 2 D fwd + D bwd + Adam)",
                          step.d_phase),
                         ("G phase (G fwd+bwd + 2 D fwd + Adam)",
                          step.g_phase)):
        # timed_scan donates its carry — rebuild the states per phase
        _, _, gs_p = build_states()
        dt = timed_scan(phase, gs_p, args, iters=ITERS)
        print(f"{label:56s} {dt*1e3:8.2f} ms", flush=True)


def run_modules():
    print(f"--- modules (bf16 fwd+bwd, {IMG}px bs{BS}) ---", flush=True)
    x = jnp.zeros((BS, IMG, IMG, 3))
    m = jnp.zeros((BS, IMG, IMG, 1))
    module_fwd_bwd(ComposeNet(), (x,), "G ComposeNet (backbone+aux+heads)")
    module_fwd_bwd(ResNetFPN(), (x,), "ResNet50-FPN backbone alone",
                   takes_train=False)
    module_fwd_bwd(Discriminator(in_size=IMG), (x, m, m),
                   "Discriminator (2 MaskMappers + head)")
    module_fwd_bwd(MaskMapper(in_size=IMG, max_channel=64), (x[..., 0:1], m),
                   "single MaskMapper")


def main():
    only = set(sys.argv[1:])
    if not only or "phases" in only:
        run_phases()
    if not only or "modules" in only:
        run_modules()


if __name__ == "__main__":
    main()
