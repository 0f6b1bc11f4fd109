"""Attribution probes for BCP's ContentEndoer cost (profile_bcp.py shows it
at ~57 of the 85 ms bf16 step — 67%).

Hypotheses probed, each scan-amortized + fetch-synced (tools/bench_util):

  1. lane occupancy: a 64-out-channel conv uses half the MXU's 128-lane
     output axis.  Time one 3x3 stride-1 conv fwd+bwd at BCP's dominant
     shape (bs16, 128x128 spatial) across widths 32/64/128/256 and report
     achieved TFLOP/s.  If rate(128) >~ 2x rate(64), a masked-dense merge of
     the two towers (one 128-ch conv with a block-diagonal kernel mask —
     exact same math, unlike the grouped-conv attempt that XLA lowers badly)
     would beat the two separate 64-ch convs; if rate(128) ~= 1.3-1.7x,
     the merge is a wash (2x the FLOPs at the higher rate).
  2. instance-norm overhead: ContentEndoer with bn=None on both towers vs
     the reference config (tower b instance-normed).
  3. the full dual-tower encoder at each hypothesis' predicted rate.

Usage: python tools/probe_bcp_encoder.py [convs] [towers]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from vaeplay_tpu.utils.jitting import jit_init
from tools.bench_util import timed_scan

BS = 16
HW = 128
CDT = jnp.bfloat16


def time_fwd_bwd(mod, x, label, flops=None, iters=30):
    v = jit_init(mod, {"params": jax.random.PRNGKey(0)}, x)

    def loss(params):
        out = mod.apply({"params": jax.tree_util.tree_map(
            lambda p: p.astype(CDT), params)}, x.astype(CDT), train=True)
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    def step(params, *_):
        l, g = jax.value_and_grad(loss)(params)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-30 * gg, params, g), l

    dt = timed_scan(step, v["params"], (), iters=iters)
    rate = f"  {flops / dt / 1e12:7.1f} TF/s" if flops else ""
    print(f"{label:58s} {dt*1e3:8.2f} ms{rate}", flush=True)
    return dt


class OneConv(nn.Module):
    c: int

    @nn.compact
    def __call__(self, x, train=True):
        return nn.Conv(self.c, (3, 3), padding="SAME", name="c")(x)


class Stack4(nn.Module):
    """4 chained convs — amortizes boundary effects of a single op."""
    c: int

    @nn.compact
    def __call__(self, x, train=True):
        for i in range(4):
            x = nn.Conv(self.c, (3, 3), padding="SAME", name=f"c{i}")(x)
            x = nn.leaky_relu(x, 0.02)
        return x


def probe_convs():
    print(f"--- 3x3 stride-1 conv fwd+bwd, bf16, bs{BS} {HW}x{HW} ---",
          flush=True)
    for c in (32, 64, 128, 256):
        x = jnp.zeros((BS, HW, HW, c))
        # fwd MACs*2, bwd ~2x fwd (dgrad + wgrad)
        flops = 3 * (2 * BS * HW * HW * 9 * c * c)
        time_fwd_bwd(Stack4(c), x, f"Stack4 conv {c}->{c}", flops * 4)


def probe_towers():
    from vaeplay_tpu.models.bcp import ContentEndoer, TMPBlock

    x5 = jnp.zeros((BS, 512, 512, 5))
    print("--- ContentEndoer variants (512px input, fwd+bwd, bf16) ---",
          flush=True)
    time_fwd_bwd(ContentEndoer(merged=False), x5,
                 "dual towers, ref config (none+instance)")
    time_fwd_bwd(ContentEndoer(merged=True), x5,
                 "merged block-diagonal 128-ch stack (shipped candidate)")

    class MergedTail(nn.Module):
        """Merged only where the probe predicts a win: blocks >= `split_at`
        run block-diagonal 128-ch at 128x128 spatial; earlier blocks stay
        dual 64-ch (memory-bound at 512/256px, where 2x FLOPs only hurt)."""
        split_at: int = 2

        @nn.compact
        def __call__(self, x, train=True):
            from vaeplay_tpu.models.bcp import MergedTMPBlock
            ya = yb = x
            for i in range(self.split_at):
                ya = TMPBlock(64, if_down=i < 2, bn=None, name=f"a{i}")(
                    ya, train=train)
                yb = TMPBlock(64, if_down=i < 2, bn="instance", name=f"b{i}")(
                    yb, train=train)
            y = jnp.concatenate([ya, yb], axis=-1)
            for i in range(self.split_at, 8):
                y = MergedTMPBlock(64, if_down=i < 2, name=f"m{i}")(
                    y, train=train)
            return y

    time_fwd_bwd(MergedTail(2), x5, "dual 512/256px blocks + merged 128px tail")

    class NoIN(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            def tower(prefix):
                y = x
                for i in range(8):
                    y = TMPBlock(64, if_down=i < 2, bn=None,
                                 name=f"{prefix}{i}")(y, train=train)
                return y
            return jnp.concatenate([tower("a"), tower("b")], axis=-1)

    time_fwd_bwd(NoIN(), x5, "dual towers, NO instance norm")

    class Dense128(nn.Module):
        """One 128-ch tower with dense convs — an UPPER-bound probe for the
        masked-dense merge (mask multiply adds nothing at this scale).  Same
        conv count as ONE tower, 4x its per-conv FLOPs = 2x the pair's."""

        @nn.compact
        def __call__(self, x, train=True):
            y = x
            for i in range(8):
                y = TMPBlock(128, if_down=i < 2, bn=None,
                             name=f"m{i}")(y, train=train)
            return y

    time_fwd_bwd(Dense128(), x5, "single 128-ch dense tower (merge probe)")


def main():
    only = set(sys.argv[1:])
    if not only or "convs" in only:
        probe_convs()
    if not only or "towers" in only:
        probe_towers()


if __name__ == "__main__":
    main()
