"""Ring (context-parallel) attention vs single-device reference on an
8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')

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


def test_ring_gradients_match_reference(eight_devices):
    """The ring path must be differentiable with the same gradients as the
    single-device attention (it is used inside train steps)."""
    mesh = create_mesh(n_data=1, n_model=8)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 256, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 256, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 256, 16)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_reference_attention(q, k, v)))

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(ring_self_attention(q, k, v, mesh, axis="model")))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_point_attention_block_ring_routing(eight_devices):
    """PointSelfAttentionBlock must produce identical values with ring
    attention enabled (model axis sharded, via an explicit RingRouting
    handle) and disabled."""
    from vaeplay_tpu.core.layers import PointSelfAttentionBlock
    from vaeplay_tpu.ops.attention import RingRouting

    mesh = create_mesh(n_data=1, n_model=8)
    m = PointSelfAttentionBlock()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 512, 24)),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    base = m.apply(v, x, train=False)
    m_ring = PointSelfAttentionBlock(ring=RingRouting(mesh, min_n=256))
    ringed = m_ring.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(ringed), np.asarray(base),
                               atol=2e-4, rtol=2e-4)


def test_bcp_forward_sharded_point_attention(eight_devices):
    """BCP forward with the point-attention stack routed through ring
    attention on a dp2 x cp4 mesh == the unsharded forward (VERDICT item 5).
    The routing is an explicit RingRouting handle on the model config; the
    param tree is routing-independent, so the same variables serve both."""
    from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
    from vaeplay_tpu.models.bcp import ComposeNet
    from vaeplay_tpu.ops.attention import RingRouting
    from vaeplay_tpu.utils.jitting import jit_init

    img, p = 64, 128
    model = ComposeNet(image_size=img, pt_size=p, point_attention=True)
    b = SyntheticBCPDataset(img_size=img, max_points=p).sample_batch(2)
    x = jnp.asarray(b["imgs"])
    cnt = jnp.asarray(b["points"][..., :2])
    counts = jnp.sum(jnp.asarray(b["pmask"]), axis=1).astype(jnp.int32)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)}, x, cnt, counts)
    base = model.apply(v, x, cnt, counts, train=False)
    mesh = create_mesh(n_data=2, n_model=4)
    model_ring = ComposeNet(image_size=img, pt_size=p, point_attention=True,
                            ring=RingRouting(mesh, min_n=64))
    ringed = model_ring.apply(v, x, cnt, counts, train=False)
    np.testing.assert_allclose(np.asarray(ringed["target_pts"]),
                               np.asarray(base["target_pts"]),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(ringed["target_frequency"]),
                               np.asarray(base["target_frequency"]),
                               atol=5e-4, rtol=5e-4)
