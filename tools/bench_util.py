"""Shared TPU benchmark timing.

Measurement rule (learned the hard way, round 2): under the axon TPU runtime,
`jax.block_until_ready` returns once work is *enqueued* through the tunnel,
NOT once it has executed — a chained train step that truly costs ~210 ms
"measures" ~3 ms with block_until_ready.  The only sync that cannot lie is a
real device→host DATA fetch of a value that data-depends on the end of the
chain: `np.asarray(scalar)` must wait for every step feeding it.

So: chain each iteration on the previous iteration's outputs (CLAUDE.md —
unchained dispatch streams under-report), and bound the measured window with
one scalar fetch on each side.
"""

import time

import jax
import numpy as np


def _force(x):
    """Force execution of everything `x` depends on: fetch real bytes."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timed_chain(run, iters: int = 10, warmup: int = 2):
    """Time `run()` (which must chain each call on the previous call's
    result, e.g. via a state holder) with fetch-based sync.

    Returns seconds per iteration.  `run` returns any pytree whose first leaf
    is safe to fetch (a scalar metric, not a huge tensor).
    """
    out = None
    for _ in range(warmup):
        out = run()
    _force(out)                      # drain the pipe: warmups fully executed
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    _force(out)                      # data fetch == the chain truly finished
    return (time.perf_counter() - t0) / iters


def timed_scan(step, state, args, iters: int = 100):
    """Per-step device time of a train step, measured as `lax.scan(step, K)`
    inside ONE jit program — the production-faithful number.

    Through the axon tunnel every dispatched program pays ~8-40 ms of
    enqueue/roundtrip latency (measured: a chained x+1 program runs at
    8.5-42 ms/iter; a co-located host pays microseconds), so per-program
    host-loop timing measures the tunnel, not the step.  Scanning K steps in
    one program amortizes the tunnel cost to <1 ms/step and reports what a
    real deployment (host co-located with the chip, or the loop compiled)
    would see.

    `step` is (state, *args) -> (state, metrics); the same `args` batch is
    reused every iteration (weights still advance through the carry).
    """
    import functools

    def body(s, _):
        s, m = step(s, *args)
        return s, jax.tree_util.tree_leaves(m)[0]

    # Donate the carry: without aliasing, params + optimizer state live twice
    # in HBM for the duration of the program (OOMs the larger families).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_k(s):
        s, ms = jax.lax.scan(body, s, None, length=iters)
        return s, ms[-1]

    s, last = run_k(state)        # compile + warmup execution
    _force(last)
    t0 = time.perf_counter()
    s, last = run_k(s)
    _force(last)
    return (time.perf_counter() - t0) / iters
