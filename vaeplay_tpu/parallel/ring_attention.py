"""Ring attention — sequence/context-parallel softmax attention over a device
mesh axis.

The reference has no sequence dimension; its honest long-context analog is
the point-set attention over up to 4096 contour points (networks_BCP.py:80-97)
and 720 ellipse samples (SURVEY.md §2.3).  This module shards that point axis
across chips: each device holds an N/d slice of Q/K/V, K/V slices rotate
around the ring via lax.ppermute while every device accumulates its queries'
online-softmax state — flash attention distributed over ICI, O(N/d) memory
per chip and d-1 neighbor exchanges that overlap with compute.

Semantics match ops.attention.spatial_self_attention (unscaled logits).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG_INF = -1e30


def _mark_varying(x, axis_name):
    """Mark a locally-constructed array as varying over the mesh axis, so it
    can carry the same type as per-device loop outputs.  jax.lax.pvary is
    deprecated in favour of pcast(..., to='varying'); support both."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)


def _ring_body(q, k, v, axis_name: str, vary_axes=None):
    """Local shard computation inside shard_map: q/k/v (B, n_local, D*).
    vary_axes: all mesh axes the inputs vary over (ring axis + co-sharded
    batch axes) — locally-constructed carries must be marked varying over
    the same set."""
    vary_axes = vary_axes or axis_name
    n_dev = jax.lax.psum(1, axis_name)
    b, nl, dv = v.shape

    def step(carry, _):
        m, l, acc, k_cur, v_cur = carry
        s = jnp.einsum("bnd,bmd->bnm", q, k_cur,
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bnm,bmc->bnc", p.astype(v_cur.dtype), v_cur)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_new, l_new, acc_new, k_nxt, v_nxt), None

    # init values must carry the same "varying over axis" type as the loop
    # outputs — mark them varying
    init = (
        _mark_varying(jnp.full((b, q.shape[1]), _NEG_INF, jnp.float32), vary_axes),
        _mark_varying(jnp.zeros((b, q.shape[1]), jnp.float32), vary_axes),
        _mark_varying(jnp.zeros((b, q.shape[1], dv), jnp.float32), vary_axes),
        k, v,
    )
    (m, l, acc, _, _), _ = jax.lax.scan(step, init, None, length=n_dev)
    return (acc / l[..., None]).astype(q.dtype)


def ring_self_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mesh: Mesh, axis: str = "model",
) -> jnp.ndarray:
    """Context-parallel attention: the N axis of q/k/v is sharded over
    `axis`; output comes back with the same sharding.  N must divide the
    axis size.  When the mesh also has a batch ("data") axis that divides
    the batch, the batch axis is co-sharded over it — DP x CP in one
    shard_map (no all-gather of the batch)."""
    n_dev = mesh.shape[axis]
    assert q.shape[1] % n_dev == 0, (q.shape, n_dev)
    batch_axes = tuple(
        a for a in mesh.axis_names
        if a != axis and mesh.shape[a] > 1 and q.shape[0] % mesh.shape[a] == 0
    )
    batch_spec = batch_axes if batch_axes else None
    spec = P(batch_spec, axis, None)
    fn = jax.shard_map(
        functools.partial(_ring_body, axis_name=axis,
                          vary_axes=batch_axes + (axis,)),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)
