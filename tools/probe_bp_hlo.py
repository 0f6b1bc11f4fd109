"""Diff the optimized HLO of BP's fast (const sample_pts) vs slow (computed
sample_pts) stage-2 programs to find the 10 ms of extra work the bf16 phase
does (tools/probe_bp_gather.py isolated it to the ELPP embed/sp path, not
the gather).

Prints an op-kind histogram per program plus the biggest count deltas, and
each program's cost_analysis FLOPs.
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
from vaeplay_tpu.models.bp import (
    SAMPLE_COUNT, SAMPLE_SCALE, VALUE_WEIGHT, EmitLinePredictor,
    EmitLineParamPredictor)
from vaeplay_tpu.ops.geometry import sample_points_ellipse
from vaeplay_tpu.ops.image import point_sample_ng
from vaeplay_tpu.utils.amp import cast_floating
from vaeplay_tpu.utils.jitting import jit_init

IMG = int(os.environ.get("BP_IMG", 512))
BS = int(os.environ.get("BP_BS", 8))
CDT = jnp.bfloat16


def main():
    model = EmitLinePredictor(image_size=IMG)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, 5)))
    params = cast_floating(v["params"], CDT)
    imgs, p1, _ = SyntheticEmitDataset(img_size=IMG).sample_batch(BS)
    x_in = cast_floating(jnp.asarray(imgs), CDT)
    p1s = jnp.asarray(p1)
    grid_const = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (BS, SAMPLE_COUNT, 2)).astype(np.float32))
    sp_const = jax.jit(lambda p: sample_points_ellipse(
        p, SAMPLE_COUNT, SAMPLE_SCALE))(p1s)

    from vaeplay_tpu.core.layers import ConvBlock
    from flax import linen as nn

    class Pyr(nn.Module):
        @nn.compact
        def __call__(self, y, train=True):
            for i, (c, s) in enumerate(model.channels):
                y = ConvBlock(c, 3, stride=s, activate="lrelu",
                              name=f"conv{i}")(y, train=train)
            return y

    def mk_loss(dyn_sp):
        def loss(params):
            feat = Pyr().apply(
                {"params": {k: vv for k, vv in params.items()
                            if k.startswith("conv")}}, x_in)
            fp = point_sample_ng(feat, cast_floating(grid_const, CDT),
                                 False, "bilinear")
            pr = cast_floating(p1s, CDT)
            if dyn_sp:
                sp = sample_points_ellipse(pr, SAMPLE_COUNT, SAMPLE_SCALE)
            else:
                sp = cast_floating(sp_const, CDT)
            out = EmitLineParamPredictor(model.channels[-1][0]).apply(
                {"params": params["param_predictor"]}, fp, sp, pr, train=True)
            return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(out))

        def step(p):
            g = jax.grad(loss)(p)
            return jax.tree_util.tree_map(
                lambda q, gg: q - 1e-30 * gg, p, g)

        return step

    hists = {}
    for name, dyn in (("const-sp", False), ("dyn-sp", True)):
        compiled = jax.jit(mk_loss(dyn)).lower(params).compile()
        txt = compiled.as_text()
        ops = Counter()
        bigshapes = Counter()
        for m in re.finditer(r"^\s*(?:ROOT )?[%\w.-]+ = (\w+)\[([\d,]*)",
                             txt, re.M):
            kind, shape = m.group(1), m.group(2)
            ops[kind] += 1
            if shape:
                n = 1
                for d in shape.split(","):
                    if d:
                        n *= int(d)
                if n >= (1 << 22):  # tensors >= 4M elements
                    bigshapes[f"{kind}[{shape}]"] += 1
        hists[name] = ops
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(f"== {name}: flops={ca.get('flops', float('nan')):.3e} "
              f"bytes={ca.get('bytes accessed', float('nan')):.3e}",
              flush=True)
        print("   big tensors:", dict(bigshapes.most_common(12)), flush=True)

    print("\n== op-count deltas (dyn - const) ==", flush=True)
    all_kinds = set(hists["const-sp"]) | set(hists["dyn-sp"])
    deltas = {k: hists["dyn-sp"][k] - hists["const-sp"][k] for k in all_kinds}
    for k, d in sorted(deltas.items(), key=lambda kv: -abs(kv[1])):
        if d:
            print(f"  {k:28s} {d:+4d}  (const={hists['const-sp'][k]}, "
                  f"dyn={hists['dyn-sp'][k]})", flush=True)


if __name__ == "__main__":
    main()
