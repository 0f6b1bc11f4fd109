"""Breakdown profile of the BE_font train iteration on the real TPU chip.

Round-3 verdict item 8: BE_font sits at ~37% MXU (25 ms bf16 vs a 9 ms
compute floor at 64px/bs32) — decide whether that is a cheap win or a
latency/layer-count bound.  Attributes the step cost by standalone fwd+bwd
of each module at BE_font shapes (the fused step runs the G 3x fwd + 2x bwd
across its D/G/distill phases, the D 4x fwd + 1-2x bwd — see
train/steps_be_font.py):

  - G ComposeNet (U-Net + relay FCs + embeds), with the label-embed path
  - EmbedPair (2x EmbedingBlock: MLP + 3 single-position attention sites)
  - StylePair (2x StyleEncodeBlock conv stacks, the distill-phase target)
  - the relay FC pair alone (2x 8704->8192 dense at bs32 — the G's
    parameter mass, reference networks_BE_font.py:148-152)
  - Discriminator (adv + aux Classifier pair)
  - MaskNet head

All timing is scan-amortized + fetch-synced per CLAUDE.md benchmarking rules
(tools/bench_util.timed_scan).  Reference workload: train_BE_font.py:230-234.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flax import linen as nn

from vaeplay_tpu.core.layers import DenseBlock
from vaeplay_tpu.models.be_font import (
    ComposeNet, Discriminator, EmbedPair, MaskNet, StylePair)
from vaeplay_tpu.utils.amp import to_compute
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("FONT_IMG", 64))
BS = int(os.environ.get("FONT_BS", 32))
ITERS = int(os.environ.get("FONT_ITERS", 50))
CDT = jnp.bfloat16


def module_fwd_bwd(mod, args, label, iters=ITERS, method=None, kwargs=None):
    kw = dict(kwargs or {})
    v = jit_init(mod, {"params": jax.random.PRNGKey(0)}, *args,
                 **({"method": method} if method else {}), **kw)

    def loss(params):
        variables = {"params": to_compute(params, CDT)}
        if "batch_stats" in v:
            variables["batch_stats"] = to_compute(v["batch_stats"], CDT)
        out = mod.apply(variables, *[to_compute(a, CDT) for a in args],
                        train=True,
                        **{k: to_compute(a, CDT) for k, a in kw.items()},
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


class RelayOnly(nn.Module):
    """The G's two bottleneck relay FCs at their true shapes."""

    width: int = 512 * (4 * 4)

    @nn.compact
    def __call__(self, flat, train=True):
        flat = DenseBlock(self.width, name="relay0")(flat)
        return DenseBlock(self.width, name="relay1")(flat)


def run_full():
    from vaeplay_tpu.data.font_data import SyntheticGlyphDataset
    from vaeplay_tpu.train.steps_be_font import (
        create_font_state, make_be_font_train_step)

    print(f"--- FULL fused step (bf16, {IMG}px bs{BS}) ---", flush=True)
    g_model = ComposeNet(in_size=IMG)
    d_model = Discriminator(in_size=IMG)
    x = jnp.zeros((1, IMG, IMG, 3))
    y = {"cls": jnp.zeros((1, 143)), "cnt_style": jnp.zeros((1, 5))}
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x, y,
                  method=g_model.init_all)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)},
                  jnp.zeros((1, IMG, IMG, 2)), y)
    fs = create_font_state(g_model, d_model, gv, dv, 1e-4)
    step = make_be_font_train_step(g_model, d_model, 1e-4, compute_dtype=CDT)
    b = next(SyntheticGlyphDataset(data_size=BS).batches(BS, IMG))
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["masks"]),
            jnp.asarray(b["edges"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["styles"]))
    dt = timed_scan(step, fs, args, iters=ITERS)
    print(f"{'FULL step (D + G + style-distill phases)':56s} {dt*1e3:8.2f} ms",
          flush=True)


def run_modules():
    print(f"--- modules (bf16 fwd+bwd, {IMG}px bs{BS}) ---", flush=True)
    x = jnp.zeros((BS, IMG, IMG, 3))
    m2 = jnp.zeros((BS, IMG, IMG, 2))
    y = {"cls": jnp.zeros((BS, 143)), "cnt_style": jnp.zeros((BS, 5))}
    g = ComposeNet(in_size=IMG)
    module_fwd_bwd(g, (x,), "G ComposeNet (U-Net + relay + embeds)",
                   method=g.init_all, kwargs={"y": y})
    module_fwd_bwd(EmbedPair(), (y["cls"], y["cnt_style"]),
                   "EmbedPair (2x MLP + 3 attn @ 1 position)")
    module_fwd_bwd(StylePair(in_size=IMG), (x, x),
                   "StylePair (2x StyleEncodeBlock conv stacks)")
    flat = jnp.zeros((BS, 512 * 16 + 256 + 256))
    module_fwd_bwd(RelayOnly(), (flat,),
                   "relay FC pair alone (8704->8192->8192)")
    module_fwd_bwd(Discriminator(in_size=IMG), (m2,),
                   "Discriminator (adv + aux Classifier pair)",
                   kwargs={"y": y})
    module_fwd_bwd(MaskNet(64), (jnp.zeros((BS, IMG, IMG, 64)),),
                   "MaskNet head (3 convs at 64px)")


def main():
    only = set(sys.argv[1:])
    if not only or "full" in only:
        run_full()
    if not only or "modules" in only:
        run_modules()


if __name__ == "__main__":
    main()
