"""Per-SITE attribution of the Style_GAN Generator's fwd+bwd time
(round-4 VERDICT item 4: the ~50 ms/branch left after the gated-conv stack
was hand-waved as "StyleUp decoder + z→plane MLP + tanh head" with no table).

Each section instantiates one Generator sub-structure at its TRUE shapes in
the 256px bs32 bf16 reference workload and measures fwd+bwd scan-amortized +
fetch-synced (tools/bench_util.timed_scan).  Sections (reference
network_Style_GAN.py):
  mlp         z→plane MLP, 512 → 65536 dense stack (:182-199, applied :130-133)
  gated       the six label-gated MyConv2d sites (:72-79,92-98) [bucketed]
  skips       skip1-3 instance-norm convs (:99,102,105)
  up1/2/3     StyleUp sites: ConvTranspose(4,2,1)+IN+relu, skip concat,
              3x3 conv, 2x SCSE(r=4) (:45-65)
  up*_convT   the ConvTranspose alone at each StyleUp's shapes
  final       final ConvTranspose + 3x 3x3 convs + tanh head (:115-121)

Run on the real chip: python tools/probe_style_decoder.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vaeplay_tpu.core.layers import ConvBlock, ConvTransposeBlock, SCSEBlock
from vaeplay_tpu.models.style_gan import MLP, MyConv2d, StyleUp
from vaeplay_tpu.utils.amp import to_compute
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("SG_IMG", 256))
BS = int(os.environ.get("SG_BS", 32))
Z = 512
ITERS = int(os.environ.get("SG_ITERS", 20))
CDT = jnp.bfloat16


def bench(module, inputs, label_txt, extra_apply_kwargs=None):
    """fwd+bwd time of `module` on `inputs` (tuple of arrays; first is the
    differentiated activation path's primary input)."""
    kw = extra_apply_kwargs or {}
    small = tuple(a[:1] for a in inputs)
    v = jit_init(module, {"params": jax.random.PRNGKey(0)}, *small, **kw)

    def loss(params):
        out = module.apply({"params": to_compute(params, CDT)},
                           *(to_compute(a, CDT) if a.dtype != jnp.int32 else a
                             for a in inputs), **kw)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def step(params, *_):
        l, gr = jax.value_and_grad(loss)(params)
        return jax.tree_util.tree_map(lambda p, g: p - 1e-30 * g, params, gr), l

    dt = timed_scan(step, v["params"], (), iters=ITERS)
    print(f"{label_txt:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


class Skips(nn.Module):
    @nn.compact
    def __call__(self, d1, d2, d3, train=True):
        s1 = ConvBlock(256, 3, bn="instance", name="skip1")(d3, train=train)
        s2 = ConvBlock(128, 3, bn="instance", name="skip2")(d2, train=train)
        s3 = ConvBlock(64, 3, bn="instance", name="skip3")(d1, train=train)
        return (jnp.sum(s1) + jnp.sum(s2) + jnp.sum(s3))[None]


class UpOnly(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip, train=True):
        return StyleUp(self.features, name="up")(x, skip, train=train)


class ConvTOnly(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=True):
        return ConvTransposeBlock(self.features, 4, stride=2, padding=1,
                                  output_padding=0, name="up")(x)


class CatConvOnly(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=True):
        return ConvBlock(self.features, 3, name="cat")(x, train=train)


class SCSEOnly(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        y = SCSEBlock(reduction=4, name="scse0")(x)
        y = SCSEBlock(reduction=4, name="scse1")(y)
        return nn.relu(y)


class FinalHead(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        y = ConvTransposeBlock(32, 4, stride=2, padding=1, output_padding=0,
                               name="final_up")(x)
        y = ConvBlock(32, 3, name="final_c0")(y, train=train)
        y = ConvBlock(32, 3, name="final_c1")(y, train=train)
        y = ConvBlock(3, 3, activate=None, name="final_c2")(y, train=train)
        return nn.tanh(y)


class MLPOnly(nn.Module):
    @nn.compact
    def __call__(self, z):
        return MLP(Z, IMG * IMG, 3, name="mlp")(z)


def main():
    s = IMG
    print(f"--- Style_GAN G per-site attribution (bf16, {IMG}px bs{BS}, "
          f"fwd+bwd, scan-amortized) ---", flush=True)
    z = jnp.zeros((BS, Z))
    bench(MLPOnly(), (z,), "z→plane MLP (512→65536)")

    skip_shapes = {  # activation shapes feeding each site at 256px
        "d1": (BS, s // 2, s // 2, 64),
        "d2": (BS, s // 4, s // 4, 128),
        "d3": (BS, s // 8, s // 8, 256),
        "d4": (BS, s // 16, s // 16, 256),
    }
    zeros = {k: jnp.zeros(v) for k, v in skip_shapes.items()}
    bench(Skips(), (zeros["d1"], zeros["d2"], zeros["d3"]), "skip1-3 IN convs")

    ups = (
        ("up1", 256, zeros["d4"], jnp.zeros((BS, s // 8, s // 8, 256))),
        ("up2", 128, jnp.zeros((BS, s // 8, s // 8, 256)),
         jnp.zeros((BS, s // 4, s // 4, 128))),
        ("up3", 64, jnp.zeros((BS, s // 4, s // 4, 128)),
         jnp.zeros((BS, s // 2, s // 2, 64))),
    )
    for name, f, x, skip in ups:
        bench(UpOnly(f), (x, skip), f"{name} StyleUp full "
              f"({x.shape[1]}px {x.shape[3]}ch → {2*x.shape[1]}px {f}ch)")
        bench(ConvTOnly(f), (x,), f"{name}   ConvTranspose(4,2,1) alone")
        cat_in = jnp.zeros((BS, 2 * x.shape[1], 2 * x.shape[1],
                            f + skip.shape[3]))
        bench(CatConvOnly(f), (cat_in,), f"{name}   cat 3x3 conv alone")
        scse_in = jnp.zeros((BS, 2 * x.shape[1], 2 * x.shape[1], f))
        bench(SCSEOnly(), (scse_in,), f"{name}   2x SCSE alone")

    bench(FinalHead(), (jnp.zeros((BS, s // 2, s // 2, 64)),),
          "final head (ConvT + 3 convs + tanh, →256px)")


if __name__ == "__main__":
    main()
