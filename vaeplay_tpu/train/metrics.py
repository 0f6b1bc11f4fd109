"""Device-side metric accumulation.

Host syncs are expensive in this environment (~50ms+ per fetch over the device
tunnel; the reference's per-iteration `.item()` pattern, train.py:81-85, would
dominate a ~2ms train step).  `accumulating(step)` folds `acc += metrics` into
the compiled step so the host only fetches scalars at logging boundaries.
"""

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def accumulating(step_fn: Callable, fuse: bool = True) -> Callable:
    """Wrap a (state, *args) -> (state, metrics) step into
    (state, acc, count, *args) -> (state, acc', count') with acc' = acc +
    metrics accumulated on device.  Pass acc=None to start.

    fuse=True compiles the step + accumulation as one program; use
    fuse=False for steps that are deliberately multiple programs (e.g. the
    memory-split GAN phases) — the accumulation then runs as its own tiny
    jitted add."""

    # donate_argnums: the caller always rebinds (state, acc, count) to the
    # returns, so XLA may alias the buffers — without this every dispatch
    # holds OLD + NEW state simultaneously (~2x params + optimizer state in
    # HBM; the Style_GAN reference workload OOMed a v5e chip exactly this
    # way — scan-carried benches never see it).  XLA:CPU ignores donation,
    # so the CPU test suite is unaffected.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _acc(acc, count, metrics):
        return jax.tree_util.tree_map(jnp.add, acc, metrics), count + 1

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def wrapped(state, acc, count, *args):
        state, metrics = step_fn(state, *args)
        acc = jax.tree_util.tree_map(jnp.add, acc, metrics)
        return state, acc, count + 1

    def call(state, acc, count, *args):
        if acc is None:
            acc = jax.tree_util.tree_map(
                lambda _: jnp.zeros((), jnp.float32), _metric_template(step_fn, state, args)
            )
            count = jnp.zeros((), jnp.int32)
        if fuse:
            return wrapped(state, acc, count, *args)
        state, metrics = step_fn(state, *args)
        acc, count = _acc(acc, count, metrics)
        return state, acc, count

    return call


def _metric_template(step_fn, state, args):
    shapes = jax.eval_shape(step_fn, state, *args)[1]
    return shapes


def zeros_like_metrics(metrics_shape) -> Dict:
    return jax.tree_util.tree_map(lambda s: jnp.zeros((), jnp.float32), metrics_shape)


def fetch_averages(acc, count) -> Dict[str, float]:
    """One host sync: pull the accumulated sums + count, return means."""
    acc, count = jax.device_get((acc, count))
    n = max(int(count), 1)
    return {k: float(v) / n for k, v in acc.items()}
