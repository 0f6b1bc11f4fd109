"""Pallas attention kernel vs the reference einsum, including torch parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.ops.attention import (
    _pallas_attention,
    _reference_attention,
    spatial_self_attention,
)


@pytest.mark.parametrize("n,dk,dv", [(64, 4, 32), (100, 8, 16), (256, 16, 128), (333, 5, 7)])
def test_pallas_matches_reference(n, dk, dv):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, n, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, n, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, n, dv)).astype(np.float32))
    ref = _reference_attention(q, k, v)
    got = _pallas_attention(q, k, v, interpret=True, full_precision=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_matches_torch_bmm_formulation():
    """The (B,N,C) attention equals the reference torch bmm code
    (models/blocks.py:84-92) on equivalent NCHW tensors."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    b, h, w, c, cq = 2, 6, 6, 12, 3
    qn = rng.normal(size=(b, h, w, cq)).astype(np.float32)
    kn = rng.normal(size=(b, h, w, cq)).astype(np.float32)
    vn = rng.normal(size=(b, h, w, c)).astype(np.float32)

    # torch: NCHW flatten
    tq = torch.from_numpy(qn.transpose(0, 3, 1, 2)).reshape(b, cq, h * w).permute(0, 2, 1)
    tk = torch.from_numpy(kn.transpose(0, 3, 1, 2)).reshape(b, cq, h * w)
    tv = torch.from_numpy(vn.transpose(0, 3, 1, 2)).reshape(b, c, h * w)
    energy = torch.bmm(tq, tk)
    attn = torch.softmax(energy, dim=-1)
    out = torch.bmm(tv, attn.permute(0, 2, 1)).reshape(b, c, h, w).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(
        _reference_attention(
            jnp.asarray(qn.reshape(b, h * w, cq)),
            jnp.asarray(kn.reshape(b, h * w, cq)),
            jnp.asarray(vn.reshape(b, h * w, c)),
        )
    ).reshape(b, h, w, c)
    np.testing.assert_allclose(got, out, atol=1e-5)
