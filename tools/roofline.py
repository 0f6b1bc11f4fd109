"""Identify the attached TPU and measure its empirical roofline.

Prints device_kind, sustained bf16/f32 matmul TFLOP/s (large square chained
matmuls) and HBM copy bandwidth, so BENCH_FAMILIES.md rows can be judged
against the hardware actually measured instead of an assumed chip generation.

Timing: chained on the previous result with a real data fetch bounding the
window — under axon, block_until_ready returns at enqueue time, not execution
time (tools/bench_util.py).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch_scalar(x):
    """One tiny device→host data fetch that depends on x (forces the chain)."""
    return np.asarray(jax.jit(lambda v: v.ravel()[0])(x))


def _time_chained(step, x0, iters=12, warmup=3):
    x = x0
    for _ in range(warmup):
        x = step(x)
    _fetch_scalar(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _fetch_scalar(x)
    return (time.perf_counter() - t0) / iters


def matmul_tflops(n=8192, dtype=jnp.bfloat16):
    a = jnp.full((n, n), 1.0 / n, dtype)

    @jax.jit
    def step(x):
        return x @ a  # spectral radius 1: the chain stays at 1/n exactly

    dt = _time_chained(step, a)
    return 2 * n**3 / dt / 1e12


def hbm_copy_gbps(mb=1024, dtype=jnp.bfloat16):
    n = mb * 1024 * 1024 // jnp.dtype(dtype).itemsize
    x0 = jnp.ones((n,), dtype)

    @jax.jit
    def step(x):
        return jnp.roll(x, 1)  # full read + full write, not simplifiable

    dt = _time_chained(step, x0, iters=8, warmup=2)
    return 2 * mb / 1024 / dt


def main():
    d = jax.devices()[0]
    print(f"device_kind: {d.device_kind}  platform: {d.platform}")
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        print(f"HBM bytes_limit: {stats['bytes_limit'] / 2**30:.1f} GiB")
    print(f"bf16 matmul: {matmul_tflops(dtype=jnp.bfloat16):.1f} TFLOP/s")
    print(f"f32  matmul: {matmul_tflops(n=4096, dtype=jnp.float32):.1f} TFLOP/s")
    print(f"HBM copy (read+write): {hbm_copy_gbps():.0f} GiB/s")


if __name__ == "__main__":
    main()
