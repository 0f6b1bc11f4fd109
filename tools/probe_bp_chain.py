"""Bisect BP's stage-2 chain: which composition step loses the bf16 gain.

tools/probe_bp_phase.py ruled out amp casts, Adam, and f32 loss math: the
emit-line phase costs ~50 ms in BOTH dtypes while its standalone modules sum
to 40.3 ms bf16 / 52.1 ms f32.  This times the real composition
(pyramid -> gather -> EmitLineParamPredictor) under a plain sum-of-squares
loss, in three nested variants x both dtypes:

  chain-fixed   pyramid -> gather at a FIXED precomputed grid -> ELPP
  chain-ellipse pyramid -> sample_points_ellipse(params) -> gather -> ELPP
                (= EmitLinePredictor.__call__, the shipped forward)
  elpp-live     ELPP alone but fed the LIVE gather output layout (not zeros)

Comparing against the standalone rows (pyramid 8.05/8.92, gather 2.00/2.49,
ELPP 30.16/40.71 bf16/f32) localizes the residual.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
from vaeplay_tpu.models.bp import (
    SAMPLE_COUNT, SAMPLE_SCALE, VALUE_WEIGHT, EmitLinePredictor)
from vaeplay_tpu.ops.geometry import sample_points_ellipse
from vaeplay_tpu.ops.image import point_sample_ng
from vaeplay_tpu.utils.amp import cast_floating
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("BP_IMG", 512))
BS = int(os.environ.get("BP_BS", 8))
ITERS = int(os.environ.get("BP_ITERS", 20))


def main():
    model = EmitLinePredictor(image_size=IMG)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, 5)))
    host_params = jax.device_get(v["params"])
    imgs, p1, _ = SyntheticEmitDataset(img_size=IMG).sample_batch(BS)
    p1s = jnp.asarray(p1).at[:, :4].set(jnp.asarray(p1)[:, :4] * VALUE_WEIGHT)
    grid = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (BS, SAMPLE_COUNT, 2)).astype(np.float32))
    sample_fixed = jax.jit(
        lambda p: sample_points_ellipse(p, SAMPLE_COUNT, SAMPLE_SCALE))(
            p1s.at[:, :4].set(p1s[:, :4] / VALUE_WEIGHT))

    for name, cdt in (("bf16", jnp.bfloat16), ("f32", None)):
        print(f"--- compute dtype {name} ---", flush=True)
        x_in = cast_floating(jnp.asarray(imgs), cdt) if cdt else jnp.asarray(imgs)

        def fresh(dtype=cdt):
            t = jax.device_put(host_params)
            return cast_floating(t, dtype) if dtype else t

        def sumsq(out):
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                       for l in leaves)

        def apply_pyramid(params, x):
            # re-run just the conv pyramid via the module's bound scope
            from vaeplay_tpu.core.layers import ConvBlock
            from flax import linen as nn

            class Pyr(nn.Module):
                @nn.compact
                def __call__(self, y, train=True):
                    for i, (c, s) in enumerate(model.channels):
                        y = ConvBlock(c, 3, stride=s, activate="lrelu",
                                      name=f"conv{i}")(y, train=train)
                    return y

            return Pyr().apply({"params": {k: vv for k, vv in params.items()
                                           if k.startswith("conv")}}, x)

        def loss_fixed(params):
            feat = apply_pyramid(params, x_in)
            fp = point_sample_ng(feat, cast_floating(grid, cdt) if cdt else grid,
                                 False, "bilinear")
            sp = cast_floating(sample_fixed, cdt) if cdt else sample_fixed
            pr = cast_floating(p1s, cdt) if cdt else p1s
            from vaeplay_tpu.models.bp import EmitLineParamPredictor
            out = EmitLineParamPredictor(model.channels[-1][0]).apply(
                {"params": params["param_predictor"]}, fp, sp,
                pr.at[:, :4].set(pr[:, :4] / VALUE_WEIGHT), train=True,
            )
            return sumsq(out)

        def loss_ellipse(params):
            out = model.apply(
                {"params": params}, x_in,
                cast_floating(p1s, cdt) if cdt else p1s, train=True)
            return sumsq(out)

        for label, fn in (("chain-fixed (pyr->gather@const->ELPP)", loss_fixed),
                          ("chain-ellipse (shipped fwd)", loss_ellipse)):
            def step(params, *_):
                g = jax.grad(fn)(params)
                return jax.tree_util.tree_map(
                    lambda p, gg: p - 1e-30 * gg, params, g), 0.0

            dt = timed_scan(step, fresh(), (), iters=ITERS)
            print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
