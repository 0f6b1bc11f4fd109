"""Spatial / point-set self-attention.

The reference materializes the full (H*W)x(H*W) energy matrix with two bmms
(models/blocks.py:84-92) — O(N^2) HBM traffic.  Here the same math runs as a
Pallas TPU kernel that tiles the query axis and keeps K/V resident in VMEM, so
the energy matrix only ever exists one (BLK_Q, N) tile at a time in on-chip
memory.  A jnp einsum fallback covers CPU tests and tiny shapes.

Semantics (must match the reference exactly):
  attn[b, i, j] = softmax_j(q[b, i, :] . k[b, j, :])   (NO 1/sqrt(d) scaling)
  out[b, i, :]  = sum_j attn[b, i, j] * v[b, j, :]
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    energy = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(energy, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", attn.astype(v.dtype), v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int):
    """One (BLK_Q, N) tile of attention; K/V fully resident in VMEM."""
    q = q_ref[0]  # (blk_q, d)
    k = k_ref[0]  # (n_pad, d)
    v = v_ref[0]  # (n_pad, dv)
    energy = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blk_q, n_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, energy.shape, 1)
    energy = jnp.where(col < n_valid, energy, _NEG_INF)
    energy = energy - jnp.max(energy, axis=-1, keepdims=True)
    p = jnp.exp(energy)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention(q, k, v, interpret=False):
    b, n, dk = q.shape
    dv = v.shape[-1]
    blk_q = 128 if n >= 128 else _round_up(n, 8)
    n_pad = _round_up(n, blk_q)
    dk_pad = _round_up(dk, 128)
    dv_pad = _round_up(dv, 128)

    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, dk_pad - dk)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, dk_pad - dk)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, dv_pad - dv)))

    grid = (b, n_pad // blk_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=n),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, dv_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, dk_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, dk_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, dv_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, dv_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n, :dv]


@jax.custom_vjp
def _pallas_attention_ad(q, k, v):
    return _pallas_attention(q, k, v)


def _pallas_attention_fwd(q, k, v):
    return _pallas_attention(q, k, v), (q, k, v)


def _pallas_attention_bwd(res, g):
    """Reverse pass via XLA einsums (softmax-attention VJP).  The energy
    matrix is recomputed rather than saved — same rematerialization choice a
    flash backward kernel makes."""
    q, k, v = res
    energy = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(energy, axis=-1)
    dv = jnp.einsum("bnm,bnc->bmc", attn, g)
    dp = jnp.einsum("bnc,bmc->bnm", g, v)
    ds = (dp - jnp.sum(dp * attn, axis=-1, keepdims=True)) * attn
    dq = jnp.einsum("bnm,bmd->bnd", ds, k)
    dk = jnp.einsum("bnm,bnd->bmd", ds, q)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_pallas_attention_ad.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def use_pallas() -> bool:
    force = os.environ.get("VAEPLAY_FORCE_PALLAS")
    if force is not None:
        return force not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def spatial_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Unscaled softmax attention over flattened spatial (or point) positions.

    Args:  q, k: (B, N, Dk);  v: (B, N, Dv).  Returns (B, N, Dv).
    K/V must fit in VMEM per batch element for the Pallas path (N<=8192 at
    Dk,Dv<=256 comfortably covers every reference workload: H*W<=4096 spatial
    tokens, <=4096 contour points).
    """
    n = q.shape[1]
    if use_pallas() and n >= 64:
        return _pallas_attention_ad(q, k, v)
    return _reference_attention(q, k, v)
