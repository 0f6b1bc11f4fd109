"""Pin BP's bf16 loss-of-gain to the dynamic-index gather forward.

tools/probe_bp_chain.py showed: pyramid->gather->ELPP runs 37.8 ms bf16 with
a CONSTANT gather grid but 48.5 ms with the live ellipse-sampled grid, while
f32 is ~49 ms either way.  Two things turn dynamic with the ellipse: the
gather indices and the ELPP embed inputs (sample_pts).  This isolates them,
and times the candidate fix — a dense interpolation-weight MXU contraction
replacing the vmap'd dynamic-index gather (same trick the op's backward
already uses):

  std-gather      dynamic coords -> vmap gather forward (shipped)
  dense-gather    dynamic coords -> einsum(Wy, feat, Wx) forward
  const-gather    gather at const grid, ELPP embed still dynamic

All bf16, sum-of-squares loss, trivial update, scan-amortized + fetch-synced.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
from vaeplay_tpu.models.bp import (
    SAMPLE_COUNT, SAMPLE_SCALE, VALUE_WEIGHT, EmitLinePredictor,
    EmitLineParamPredictor)
from vaeplay_tpu.ops.geometry import sample_points_ellipse
from vaeplay_tpu.ops.image import (
    _axis_taps, _dense_axis_weights, _unnormalize_grid, point_sample_ng)
from vaeplay_tpu.utils.amp import cast_floating
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

IMG = int(os.environ.get("BP_IMG", 512))
BS = int(os.environ.get("BP_BS", 8))
ITERS = int(os.environ.get("BP_ITERS", 20))
CDT = jnp.bfloat16


def dense_gather(feat, grid):
    """Bilinear sample as two dense-weight contractions (MXU path)."""
    b, h, w, c = feat.shape
    fx, fy = _unnormalize_grid(grid.astype(jnp.float32), h, w, False)
    kx, base = _axis_taps(fx - jnp.floor(fx), "bilinear")
    ky, _ = _axis_taps(fy - jnp.floor(fy), "bilinear")
    wx = _dense_axis_weights(jnp.floor(fx), kx, base, w).astype(feat.dtype)
    wy = _dense_axis_weights(jnp.floor(fy), ky, base, h).astype(feat.dtype)
    tmp = jnp.einsum("bnh,bhwc->bnwc", wy, feat)
    return jnp.einsum("bnw,bnwc->bnc", wx, tmp)


def main():
    model = EmitLinePredictor(image_size=IMG)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, 5)))
    host_params = jax.device_get(v["params"])
    imgs, p1, _ = SyntheticEmitDataset(img_size=IMG).sample_batch(BS)
    x_in = cast_floating(jnp.asarray(imgs), CDT)
    p1s = jnp.asarray(p1).at[:, :4].set(jnp.asarray(p1)[:, :4] * VALUE_WEIGHT)
    grid_const = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (BS, SAMPLE_COUNT, 2)).astype(np.float32))

    def fresh():
        return cast_floating(jax.device_put(host_params), CDT)

    from vaeplay_tpu.core.layers import ConvBlock
    from flax import linen as nn

    class Pyr(nn.Module):
        @nn.compact
        def __call__(self, y, train=True):
            for i, (c, s) in enumerate(model.channels):
                y = ConvBlock(c, 3, stride=s, activate="lrelu",
                              name=f"conv{i}")(y, train=train)
            return y

    def run(label, gather_mode):
        def loss(params):
            feat = Pyr().apply(
                {"params": {k: vv for k, vv in params.items()
                            if k.startswith("conv")}}, x_in)
            pr = cast_floating(p1s, CDT)
            pr = pr.at[:, :4].set(pr[:, :4] / VALUE_WEIGHT)
            sp = sample_points_ellipse(pr, SAMPLE_COUNT, SAMPLE_SCALE)
            if gather_mode == "std":
                fp = point_sample_ng(feat, sp[..., :2], False, "bilinear")
            elif gather_mode == "dense":
                fp = dense_gather(feat, jax.lax.stop_gradient(sp[..., :2]))
            else:  # const indices, dynamic embed
                fp = point_sample_ng(feat, cast_floating(grid_const, CDT),
                                     False, "bilinear")
            out = EmitLineParamPredictor(model.channels[-1][0]).apply(
                {"params": params["param_predictor"]}, fp, sp, pr, train=True)
            return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(out))

        def step(params, *_):
            g = jax.grad(loss)(params)
            return jax.tree_util.tree_map(
                lambda p, gg: p - 1e-30 * gg, params, g), 0.0

        dt = timed_scan(step, fresh(), (), iters=ITERS)
        print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)

    run("std-gather (dynamic idx, shipped)", "std")
    run("dense-gather (dynamic idx, MXU einsum)", "dense")
    run("const-gather (dynamic embed only)", "const")


if __name__ == "__main__":
    main()
