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

import dataclasses
import functools
import os
from typing import Any, Optional

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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, n_valid: int, blk_k: int, n_kblocks: int,
                  mxu_dtype=jnp.bfloat16):
    """Flash-attention forward tile: online-softmax accumulation over K/V
    blocks.  Grid is (batch, q-blocks, k-blocks) with the k axis innermost;
    the running (max, sum, acc) state lives in VMEM scratch, which persists
    across sequential grid steps on TPU.  Matmul inputs run in bf16 with f32
    accumulation (XLA's default MXU precision); softmax math stays f32."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(mxu_dtype)             # (blk_q, dk)
    k = k_ref[0].astype(mxu_dtype)             # (blk_k, dk)
    v = v_ref[0].astype(mxu_dtype)             # (blk_k, dv)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                           # (blk_q, blk_k)
    col = j * blk_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)

    m_prev = m_scr[:]                           # (blk_q, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(mxu_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = m_new

    @pl.when(j == n_kblocks - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "full_precision"))
def _pallas_attention(q, k, v, interpret=False, full_precision=False):
    b, n, dk = q.shape
    dv = v.shape[-1]
    if n <= 512:
        blk_q = blk_k = n_pad = _round_up(n, 8)  # single block on both axes
    else:
        blk_q, blk_k = 256, 512                  # 512 % 256 == 0
        n_pad = _round_up(n, 512)
    # feature axes stay unpadded (Mosaic tiles trailing dims internally)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))

    n_kblocks = n_pad // blk_k
    grid = (b, n_pad // blk_q, n_kblocks)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, n_valid=n, blk_k=blk_k,
                          n_kblocks=n_kblocks,
                          mxu_dtype=jnp.float32 if full_precision else jnp.bfloat16),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, dv), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, dk), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, dk), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, dv), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, dv), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, dv), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :n, :]


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


@dataclasses.dataclass(frozen=True)
class RingRouting:
    """Explicit ring (context-parallel) attention routing handle.

    Threaded through model configs (e.g. `bcp.ComposeNet(ring=...)`) down to
    the attention blocks — there is NO global routing state: a model built
    without a handle never rings, one built with it always consults the same
    immutable handle at trace time, so previously compiled programs can never
    silently disagree with the configuration (the round-2 footgun this
    replaces required jax.clear_caches on every change).

    When `mesh` has >= 2 devices on `axis` and the attention position axis
    N >= min_n divides the axis size, spatial_self_attention shards the N
    axis over the mesh: K/V slices rotate via lax.ppermute while each device
    accumulates online-softmax state (SURVEY.md §2.3 SP/CP row).
    Hashable/immutable so it can live on flax module dataclasses."""

    mesh: Any = None
    axis: str = "model"
    min_n: int = 1024

    def active(self, n: int) -> bool:
        """Whether a position axis of size n routes through the ring."""
        if self.mesh is None or self.axis not in self.mesh.axis_names:
            return False
        n_dev = self.mesh.shape[self.axis]
        return n_dev >= 2 and n >= self.min_n and n % n_dev == 0


def _maybe_ring(q, k, v, ring: Optional[RingRouting]):
    if ring is None or not ring.active(q.shape[1]):
        return None
    from vaeplay_tpu.parallel.ring_attention import ring_self_attention

    return ring_self_attention(q, k, v, ring.mesh, axis=ring.axis)


def use_pallas() -> bool:
    """Whether to route attention through the Pallas flash kernel.

    Measured on one v5e chip across the reference's attention shapes
    (N 1024-8192, Dk 16-90, Dv 64-720), XLA's fused einsum attention runs
    1.2-1.8x faster than the flash kernel — the head dims here are far below
    the 128-lane MXU width, so the kernel's blockwise rescaling overhead
    dominates while XLA fuses the whole softmax-attention pattern natively.

    Round-2 follow-up at the repo's LARGEST attention workload — a full BCP
    train step (512px, bs16) with the 3-block point-attention stack ON at the
    4096-pt model cap (networks_BCP.py:71): XLA path 1.93 ms/step vs Pallas
    forward + XLA backward 1.89 ms/step — statistically identical, and only
    ~0.1 ms over the attention-off step.  XLA's fusion already avoids
    materializing the N^2 energy matrix at these head dims, including in the
    backward, so a handwritten flash backward has no headroom to win here.
    The kernel therefore ships OFF by default and is kept for (a) shapes
    where the N^2 energy matrix would not fuse/fit, and (b) as the basis for
    future sharded/ring attention; enable with VAEPLAY_FORCE_PALLAS=1.
    """
    force = os.environ.get("VAEPLAY_FORCE_PALLAS")
    if force is not None:
        return force not in ("0", "false", "")
    return False


def spatial_self_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    ring: "Optional[RingRouting]" = None,
) -> jnp.ndarray:
    """Unscaled softmax attention over flattened spatial (or point) positions.

    Args:  q, k: (B, N, Dk);  v: (B, N, Dv).  Returns (B, N, Dv).
    Dispatches to the ring (context-parallel) kernel when an explicit
    RingRouting handle is passed and active for this N, else to the flash
    kernel when use_pallas() (any N — the kernel streams K/V blockwise), else
    to XLA's fused einsum formulation.
    """
    ring_out = _maybe_ring(q, k, v, ring)
    if ring_out is not None:
        return ring_out
    n = q.shape[1]
    if use_pallas() and n >= 64:
        return _pallas_attention_ad(q, k, v)
    return _reference_attention(q, k, v)
