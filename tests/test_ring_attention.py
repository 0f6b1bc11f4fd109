"""Ring (context-parallel) attention vs single-device reference on an
8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.ops.attention import _reference_attention
from vaeplay_tpu.parallel.mesh import create_mesh
from vaeplay_tpu.parallel.ring_attention import ring_self_attention


@pytest.mark.parametrize("n,dk,dv", [(512, 16, 64), (1024, 32, 40)])
def test_ring_matches_reference(eight_devices, n, dk, dv):
    mesh = create_mesh(n_data=1, n_model=8)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, n, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, n, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, n, dv)).astype(np.float32))
    ref = _reference_attention(q, k, v)
    got = ring_self_attention(q, k, v, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_ring_output_sharded(eight_devices):
    mesh = create_mesh(n_data=1, n_model=8)
    q = jnp.ones((1, 256, 8))
    out = ring_self_attention(q, q, jnp.ones((1, 256, 16)), mesh, axis="model")
    assert out.shape == (1, 256, 16)
    # output keeps the point-axis sharding
    spec = out.sharding.spec
    assert "model" in str(spec)
