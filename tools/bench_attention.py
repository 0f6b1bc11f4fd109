"""Honest point-attention cost measurement at the repo's largest attention
workload: a full BCP train step (512px, bs16) with the 3-block point-attention
stack (networks_BCP.py:80-97) ON at the 4096-pt model cap (networks_BCP.py:71).

Three configs, each in its own subprocess (compiled programs accumulate HBM;
the Pallas toggle is an env var read at trace time):
  off     — attention stack disabled (the BENCH_FAMILIES BCP row's shape,
            but at the 4096-pt cap so rows are comparable)
  xla     — attention on, XLA fused-einsum path
  pallas  — attention on, flash kernel forward (VAEPLAY_FORCE_PALLAS=1)

Timing per tools/bench_util.timed_scan: lax.scan(step, K) in one program,
window bounded by a real device→host fetch (axon's block_until_ready returns
at enqueue time — see CLAUDE.md "Benchmarking hazards").

Usage: python tools/bench_attention.py            # run all, print table
       python tools/bench_attention.py <config>   # one config, one JSON line
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = ("off", "xla", "pallas")
IMG, BS, P = 512, 16, 4096
ITERS = 20


def run_one(config: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tools.bench_util import timed_scan
    from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
    from vaeplay_tpu.models.bcp import ComposeNet, Discriminator
    from vaeplay_tpu.train.state import TrainState, torch_adam
    from vaeplay_tpu.train.steps_bcp import make_bcp_train_step
    from vaeplay_tpu.train.steps_be_gan import GanState
    from vaeplay_tpu.utils.jitting import jit_init

    attn = config != "off"
    g_model = ComposeNet(image_size=IMG, pt_size=P, point_attention=attn)
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
    step = make_bcp_train_step(g_model, d_model)
    b = SyntheticBCPDataset(img_size=IMG, max_points=P).sample_batch(BS)
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["points"]), jnp.asarray(b["pmask"]))
    dt = timed_scan(step, gs, args, iters=ITERS)
    print("BENCH_RESULT " + json.dumps(
        {"config": config, "ms": dt * 1000, "ips": BS / dt}))


def main() -> None:
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return

    rows = []
    for config in CONFIGS:
        env = dict(os.environ)
        env["VAEPLAY_FORCE_PALLAS"] = "1" if config == "pallas" else "0"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), config],
            capture_output=True, text=True, timeout=3000, env=env,
        )
        line = [l for l in out.stdout.splitlines()
                if l.startswith("BENCH_RESULT ")]
        if line:
            r = json.loads(line[0][len("BENCH_RESULT "):])
            rows.append((r["config"], r["ms"], r["ips"]))
            print(f"{r['config']}: {r['ms']:.2f} ms/step", flush=True)
        else:
            rows.append((f"{config}: FAILED", 0, 0))
            print(f"{config} FAILED:\n{out.stdout[-400:]}\n{out.stderr[-400:]}",
                  flush=True)

    print(f"\nBCP train step, {IMG}px bs{BS}, point cap {P} "
          f"(scan-amortized, fetch-synced):")
    print("| config | ms/step |\n|---|---|")
    for config, ms, _ in rows:
        print(f"| {config} | {ms:.2f} |")


if __name__ == "__main__":
    main()
