"""Attribute the Style_GAN label-bucketing gain: G fwd+bwd blended vs
bucketed, and the gated-conv stack alone, scan-amortized + fetch-synced.

Round-3 verdict item 2 assumed the label-gated MyConv2d pair was ~half of
the G's conv FLOPs; the measured full-step gain was 237.4 -> 216.2 ms (9%),
so this probe isolates where the G's time actually goes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.models.style_gan import Generator, MyConv2d
from vaeplay_tpu.utils.amp import to_compute
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("SG_IMG", 256))
BS = int(os.environ.get("SG_BS", 32))
Z = 512
ITERS = 20
CDT = jnp.bfloat16


def g_fwd_bwd(split, label_txt):
    g = Generator(image_size=IMG, z_dim=Z)
    x = jnp.zeros((1, IMG, IMG, 3))
    v = jit_init(g, {"params": jax.random.PRNGKey(0)}, x, jnp.zeros((1, Z)),
                 jnp.zeros((1,), jnp.int32))
    xc = jnp.zeros((BS, IMG, IMG, 3))
    z = jnp.zeros((BS, Z))
    labels = jnp.asarray(np.concatenate(
        [np.zeros(BS // 2, np.int32), np.ones(BS - BS // 2, np.int32)]))

    def loss(params):
        out = g.apply({"params": to_compute(params, CDT)},
                      to_compute(xc, CDT), to_compute(z, CDT), labels,
                      train=True, split=split)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def step(params, *_):
        l, gr = jax.value_and_grad(loss)(params)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, gr), l

    dt = timed_scan(step, v["params"], (), iters=ITERS)
    print(f"{label_txt:56s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def gated_stack(split, label_txt):
    """The six MyConv2d sites alone at their true shapes."""
    from flax import linen as nn

    class GatedOnly(nn.Module):
        @nn.compact
        def __call__(self, h, labels, train=True, split=None):
            h = MyConv2d(32, 3, activate=None, name="conv1")(h, labels, train=train, split=split)
            h = MyConv2d(32, 3, activate=None, name="conv2")(h, labels, train=train, split=split)
            h = MyConv2d(64, 4, stride=2, bn="instance", name="down1")(h, labels, train=train, split=split)
            h = MyConv2d(128, 4, stride=2, bn="instance", name="down2")(h, labels, train=train, split=split)
            h = MyConv2d(256, 4, stride=2, bn="instance", name="down3")(h, labels, train=train, split=split)
            return MyConv2d(256, 4, stride=2, bn="instance", name="down4")(h, labels, train=train, split=split)

    m = GatedOnly()
    x1 = jnp.zeros((1, IMG, IMG, 4))
    y1 = jnp.zeros((1,), jnp.int32)
    v = jit_init(m, {"params": jax.random.PRNGKey(0)}, x1, y1)
    x = jnp.zeros((BS, IMG, IMG, 4))
    labels = jnp.asarray(np.concatenate(
        [np.zeros(BS // 2, np.int32), np.ones(BS - BS // 2, np.int32)]))

    def loss(params):
        out = m.apply({"params": to_compute(params, CDT)},
                      to_compute(x, CDT), labels, train=True, split=split)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def step(params, *_):
        l, gr = jax.value_and_grad(loss)(params)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, gr), l

    dt = timed_scan(step, v["params"], (), iters=ITERS)
    print(f"{label_txt:56s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    half = (BS // 2, BS - BS // 2)
    print(f"--- Style_GAN G attribution (bf16, {IMG}px bs{BS}) ---", flush=True)
    g_fwd_bwd(None, "G fwd+bwd, blended (reference form)")
    g_fwd_bwd(half, f"G fwd+bwd, bucketed {half}")
    gated_stack(None, "gated MyConv2d stack alone, blended")
    gated_stack(half, f"gated MyConv2d stack alone, bucketed {half}")


if __name__ == "__main__":
    main()
