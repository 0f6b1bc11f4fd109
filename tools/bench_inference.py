"""Per-family INFERENCE (serve-path) throughput on the real TPU chip.

The train-step numbers live in BENCH_FAMILIES.md; this measures the eval
forward each test CLI actually serves (reference test_*.py pipelines), in
the production bf16 serving mode (params + activations cast to bfloat16;
the f32 master copies only matter for training).

Timing discipline per CLAUDE.md: device-resident families scan K chained
forwards inside ONE jit program (`timed_eval_scan`, amortizing the tunnel's
~8-40 ms/program latency and bounding the window with a real data fetch);
BC — whose serve path hops through the host contour tracer between its two
device programs — is timed with the fetch-synced chained host loop
(`bench_util.timed_chain`), so its number includes the real bridge cost.

Usage:
  python tools/bench_inference.py [family ...]     # default: all families
One subprocess per family (compiled programs accumulate in HBM otherwise).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.utils.amp import to_compute
from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import _force, timed_chain

CDT = jnp.bfloat16


def timed_eval_scan(fwd, variables, imgs, extra, iters=50):
    """Per-forward device time via lax.scan of chained forwards in ONE
    program.  Each iteration's input data-depends on the previous output
    (x + 1e-30*mean — far below bf16 resolution, but XLA cannot DCE it),
    and the window is bounded by real data fetches (bench_util rules).

    `variables` MUST be threaded as an explicit jit argument, not a closure:
    closed-over weight pytrees get serialized into the compile request, and
    the axon remote_compile endpoint rejects large bodies (HTTP 413) for the
    380M-param families."""

    def body(x, _, v):
        out = fwd(v, x, *extra)
        m = jnp.mean(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
        return x + (1e-30 * m).astype(x.dtype), m

    @jax.jit
    def run_k(v, x):
        x, ms = jax.lax.scan(lambda c, _: body(c, _, v), x, None, length=iters)
        return x, ms[-1]

    x, last = run_k(variables, imgs)
    _force(last)
    t0 = time.perf_counter()
    x, last = run_k(variables, x)
    _force(last)
    return (time.perf_counter() - t0) / iters


def bench_vae():
    from vaeplay_tpu.data.circles import CircleDataset
    from vaeplay_tpu.models.vae_gan import VaeGan
    from vaeplay_tpu.ops.geometry import render_circle_batch

    IMG, BS = 256, 128
    model = VaeGan(img_size=IMG, z_size=128)
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                 jnp.zeros((2, IMG, IMG, 1)))
    vars_c = to_compute({"params": v["params"],
                         "batch_stats": v["batch_stats"]}, CDT)
    pb = jnp.asarray(next(CircleDataset(n=IMG, data_size=BS).epoch_batches(BS)))
    imgs = jax.jit(render_circle_batch, static_argnums=0)(
        IMG, pb[:, 0], pb[:, 1], pb[:, 2]).astype(CDT)
    rng = jax.random.PRNGKey(2)

    def fwd(v, x):
        return model.apply(v, x, rngs={"noise": rng},
                           method=model.reconstruct)

    return (f"VAE-GAN reconstruct 256px bs{BS} [bf16]",
            timed_eval_scan(fwd, vars_c, imgs, (), iters=50), BS)


def _be_like(model_ctor, label, bs):
    """BE / BE_GAN generator: ComposeNet eval with sigmoid heads."""
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset

    IMG = 512
    model = model_ctor()
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
    if v.get("constants"):
        variables["constants"] = v["constants"]
    vars_c = to_compute(variables, CDT)
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(bs)
    imgs = jnp.asarray(b["imgs"]).astype(CDT)

    def fwd(v, x):
        preds = model.apply(v, x, train=False)
        return {"masks": jax.nn.sigmoid(preds["masks"]),
                "edges": jax.nn.sigmoid(preds["edges"])}

    return (f"{label} 512px bs{bs} [bf16]",
            timed_eval_scan(fwd, vars_c, imgs, (), iters=20), bs)


def bench_be():
    from vaeplay_tpu.models.be import ComposeNet

    return _be_like(ComposeNet, "BE masks+edges", 32)


def bench_be_gan():
    from vaeplay_tpu.models.be_gan import ComposeNet

    return _be_like(ComposeNet, "BE_GAN generator", 16)


def bench_bp():
    from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
    from vaeplay_tpu.models.bp import ComposeNet

    IMG, BS = 512, 8
    model = ComposeNet(image_size=IMG)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    params_c = to_compute({"params": v["params"]}, CDT)
    imgs, _, _ = SyntheticEmitDataset(img_size=IMG).sample_batch(BS)
    imgs = jnp.asarray(imgs).astype(CDT)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    return (f"BP ellipse+emit 512px bs{BS} 720pts [bf16]",
            timed_eval_scan(fwd, params_c, imgs, (), iters=20), BS)


def _bc_setup():
    """Shared BC serve-path setup: model/state, stage-A mask step (bit-packed
    strided bridge), host tracer, stage-B refine jit, and a base batch."""
    from vaeplay_tpu.data.bc_data import SyntheticBCDataset
    from vaeplay_tpu.models.bc import ComposeNet
    from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
    from vaeplay_tpu.train.steps_bc import BridgeTracer, make_bc_mask_step

    IMG, BS, MP, STRIDE = 256, 32, 256, 4
    model = ComposeNet(max_points=MP, refine_fc_dtype="bfloat16")
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], v["batch_stats"],
                              frozen_backbone_adam(1e-4),
                              constants=v.get("constants"))
    mask_step = make_bc_mask_step(model, stride=STRIDE, compute_dtype=CDT)
    tracer = BridgeTracer(IMG, STRIDE, MP)
    variables = to_compute(state.variables(), CDT)

    @jax.jit
    def refine(v, x, contours):
        return model.apply(v, to_compute(x, CDT), train=False,
                           contours=contours)

    b = SyntheticBCDataset(img_size=IMG, max_points=MP).sample_batch(BS)
    base = jnp.asarray(b["imgs"])
    return model, state, mask_step, tracer, variables, refine, base, (IMG, BS, MP)


def bench_bc():
    """BC serve path = mask program → host contour trace → refine program
    (reference networks_BC.py:208-241; the trace is ON the critical path at
    serve time — prediction contours feed the refine pass).  Mirrors
    cli/test_bc.py:render_batch; fetch-synced host-loop timing.  This is the
    strictly sequential loop — `bench_bc_pipelined` measures the shipped
    overlapped form (eval/serve.pipeline_bc_batches)."""
    model, state, mask_step, tracer, variables, refine, base, (IMG, BS, MP) = _bc_setup()
    holder = {"x": base}

    def run():
        x = holder["x"]
        packed = mask_step(state, x)
        pts, counts = tracer.trace(packed)   # blocking: serve critical path
        preds = refine(variables, x, (jnp.asarray(pts), jnp.asarray(counts)))
        reg = preds["contour_regressions"]
        holder["x"] = base + (1e-30 * jnp.mean(reg.astype(jnp.float32))
                              ).astype(base.dtype)
        return reg

    dt = timed_chain(run, iters=10, warmup=2)
    return (f"BC mask→trace→refine 256px bs{BS} {MP}pts "
            f"[bf16, incl. host bridge]", dt, BS)


def bench_bc_pipelined():
    """Pipelined BC serve (eval/serve.pipeline_bc_batches): the host contour
    trace of batch i-1 and the regression fetch of batch i-2 overlap the
    device execution of batch i's mask pass.  Honest host-loop timing — the
    window is bounded by a real data fetch of EVERY batch's refine output
    (the serve contract: the per-point regressions must reach the host), and
    the per-batch trace fetch bounds host run-ahead to the pipeline depth.
    Pipeline fill/drain is included (conservative)."""
    from vaeplay_tpu.eval.serve import pipeline_bc_batches

    model, state, mask_step, tracer, variables, refine, base, (IMG, BS, MP) = _bc_setup()
    N = 16

    def dispatch_mask(x):
        return mask_step(state, x)

    def dispatch_refine(x, pts, counts):
        preds = refine(variables, x, (jnp.asarray(pts), jnp.asarray(counts)))
        return preds["contour_regressions"]

    def run_pipeline(n):
        got = 0
        for _, out in pipeline_bc_batches(dispatch_mask, tracer.submit,
                                          dispatch_refine, [base] * n):
            np.asarray(out)          # real device→host fetch per batch
            got += 1
        assert got == n
    run_pipeline(3)                  # compile both programs + warm the bridge
    t0 = time.perf_counter()
    run_pipeline(N)
    dt = (time.perf_counter() - t0) / N
    return (f"BC mask→trace→refine 256px bs{BS} {MP}pts "
            f"[bf16, pipelined bridge]", dt, BS)


def bench_bcp():
    from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
    from vaeplay_tpu.models.bcp import ComposeNet

    IMG, BS, P = 512, 16, 2048
    model = ComposeNet(image_size=IMG, pt_size=P)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, P, 2)),
                 jnp.ones((1,), jnp.int32))
    params_c = to_compute({"params": v["params"]}, CDT)
    b = SyntheticBCPDataset(img_size=IMG, max_points=P).sample_batch(BS)
    imgs = jnp.asarray(b["imgs"]).astype(CDT)
    pts = jnp.asarray(b["points"][..., :2]).astype(CDT)
    counts = jnp.sum(jnp.asarray(b["pmask"]), axis=1).astype(jnp.int32)

    def fwd(v, x, p, c):
        return model.apply(v, x, p, c, train=False)

    # Eval contours come from the host tracer on the INPUT masks
    # (networks_BCP.py:277-289) — input-dependent only, so a serve pipeline
    # overlaps the trace with device compute; device forward is the
    # steady-state cost.
    return (f"BCP classify+regress 512px bs{BS} {P}pts [bf16, device fwd]",
            timed_eval_scan(fwd, params_c, imgs, (pts, counts), iters=20), BS)


def bench_be_font():
    from vaeplay_tpu.data.font_data import SyntheticGlyphDataset
    from vaeplay_tpu.models.be_font import ComposeNet

    IMG, BS = 64, 32
    model = ComposeNet(in_size=IMG)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)),
                 {"cls": jnp.zeros((1, 143)), "cnt_style": jnp.zeros((1, 5))},
                 method=model.init_all)
    vars_c = to_compute({"params": v["params"],
                         "batch_stats": v["batch_stats"]}, CDT)
    b = next(SyntheticGlyphDataset(data_size=BS).batches(BS, IMG))
    imgs = jnp.asarray(b["imgs"]).astype(CDT)

    def fwd(v, x):
        # y=None → style self-encoded from the image (networks_BE_font.py:188-193)
        return model.apply(v, x, y=None, train=False)

    return (f"BE_font generate 64px bs{BS} [bf16]",
            timed_eval_scan(fwd, vars_c, imgs, (), iters=50), BS)


def bench_style_gan():
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.style_gan import Generator

    IMG, Z, BS = 256, 512, 32
    g = Generator(image_size=IMG, z_dim=Z)
    v = jit_init(g, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)), jnp.zeros((1, Z)),
                 jnp.zeros((1,), jnp.int32))
    params_c = to_compute({"params": v["params"]}, CDT)
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(BS)
    xc = jnp.asarray(np.repeat(b["bimgs"], 3, axis=-1)).astype(CDT)
    z = jax.random.normal(jax.random.PRNGKey(1), (BS, Z), CDT)
    y = jnp.asarray(b["labels"] % 2)

    def fwd(v, x):
        return g.apply(v, x, z, y, train=False)

    return (f"Style_GAN generate 256px z512 bs{BS} [bf16]",
            timed_eval_scan(fwd, params_c, xc, (), iters=20), BS)


FAMILIES = {
    "vae": bench_vae, "be": bench_be, "be_gan": bench_be_gan, "bp": bench_bp,
    "bc": bench_bc, "bc_pipelined": bench_bc_pipelined,
    "bcp": bench_bcp, "be_font": bench_be_font,
    "style_gan": bench_style_gan,
}


def main():
    import json
    import subprocess

    if len(sys.argv) == 2 and sys.argv[1] in FAMILIES:
        label, dt, bs = FAMILIES[sys.argv[1]]()
        print("BENCH_RESULT " + json.dumps(
            {"label": label, "ms": dt * 1000, "ips": bs / dt}))
        return

    wanted = sys.argv[1:] or list(FAMILIES)
    for name in wanted:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=1800)
            for line in out.stdout.splitlines():
                if line.startswith("BENCH_RESULT "):
                    r = json.loads(line[len("BENCH_RESULT "):])
                    print(f"| {r['label']} | {r['ms']:.2f} | {r['ips']:.1f} |",
                          flush=True)
                    break
            else:
                print(f"{name}: FAILED\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
