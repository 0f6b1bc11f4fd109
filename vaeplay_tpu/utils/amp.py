"""Mixed precision (bf16 compute, f32 state) for the fused train steps.

TPU-first policy (SURVEY.md §7 performance bullet d): master params, optimizer
state, batch-norm statistics, and every loss reduction stay float32; the
forward/backward matmuls and conv FLOPs run in bfloat16 by casting params and
inputs at the step boundary.  The casts are inserted inside the differentiated
function, so gradients come back float32 for the optimizer automatically —
no loss scaling is needed on TPU (bf16 has f32's exponent range).

Parity budget is gated by tests/test_bf16.py (loss trajectories vs f32).
"""

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast every floating-point leaf of a pytree to dtype (others pass)."""
    def one(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(one, tree)


def to_compute(tree: Any, compute_dtype) -> Any:
    """Cast params/inputs for the forward; identity for float32 compute."""
    if compute_dtype == jnp.float32 or compute_dtype is None:
        return tree
    return cast_floating(tree, compute_dtype)


def to_f32(tree: Any) -> Any:
    """Cast model outputs back to f32 before loss math / state storage."""
    return cast_floating(tree, jnp.float32)


def merge_batch_stats(master: Any, mutated: Any, compute_dtype) -> Any:
    """Fold a bf16-computed batch-stats EMA update onto the f32 master copy.

    Under mixed precision the forward normalizes with bf16 stats, so flax's
    in-module EMA update produces bf16-derived values.  Storing those directly
    would re-quantize the running statistics to bf16 every step, destroying
    EMA increments below the bf16 ulp (~0.4% relative) and preventing the
    stats from settling.  Instead accumulate the *delta* onto the f32 master:

        new_master = master + (mutated - cast(master, bf16))   # all f32

    The delta is computed from bf16 quantities (unavoidable — that is what
    the forward saw) but the accumulation itself never re-quantizes the
    master, which is the classic f32-master-weight trick applied to BN stats.
    Identity when compute_dtype is f32/None (mutated is already exact).
    """
    if compute_dtype is None or compute_dtype == jnp.float32:
        return mutated

    def one(m, mu):
        if not (hasattr(m, "dtype") and jnp.issubdtype(m.dtype, jnp.floating)):
            return mu
        delta = mu.astype(jnp.float32) - m.astype(compute_dtype).astype(jnp.float32)
        return (m.astype(jnp.float32) + delta).astype(jnp.float32)

    return jax.tree_util.tree_map(one, master, mutated)


def resolve_dtype(name) -> Any:
    """CLI --dtype string → jnp dtype (accepts f32/bf16 shorthands)."""
    if name in (None, "f32", "float32"):
        return jnp.float32
    if name in ("bf16", "bfloat16"):
        return jnp.bfloat16
    raise ValueError(f"unsupported --dtype {name!r}")
