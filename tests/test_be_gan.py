"""BE_GAN tests: discriminator shapes, two-phase fused GAN step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
from vaeplay_tpu.models.be_gan import ComposeNet, Discriminator
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam, torch_adam
from vaeplay_tpu.train.steps_be_gan import GanState, make_be_gan_train_step
from vaeplay_tpu.utils.jitting import jit_init

IMG = 128


@pytest.fixture(scope="module")
def gan_state():
    # slim backbone for the fast tier (full topology: slow-tier
    # trajectory gate test_parity_trajectory_be_gan)
    g_model = ComposeNet(backbone_layers=(1, 1, 1, 1), backbone_width=16)
    d_model = Discriminator(in_size=IMG, num_classes=4)
    x = jnp.zeros((1, IMG, IMG, 3))
    m = jnp.zeros((1, IMG, IMG, 1))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, x, m, m)
    g = TrainState.create(
        g_model.apply, gv["params"], gv["batch_stats"],
        frozen_backbone_adam(1e-4), constants=gv.get("constants"),
    )
    d = TrainState.create(d_model.apply, dv["params"], dv["batch_stats"], torch_adam(1e-5, (0.5, 0.999)))
    return g_model, d_model, GanState(g=g, d=d)


def test_discriminator_shapes(gan_state):
    g_model, d_model, gs = gan_state
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, IMG, IMG, 3))
    m = jax.random.uniform(jax.random.PRNGKey(3), (2, IMG, IMG, 1))
    (types, feats), _ = d_model.apply(
        {"params": gs.d.params, "batch_stats": gs.d.batch_stats},
        x, m, m, train=True, mutable=["batch_stats"],
    )
    assert types.shape == (2, 4)
    assert feats.ndim == 2 and feats.shape[0] == 2


def test_gan_train_step_updates_both(gan_state):
    g_model, d_model, gs = gan_state
    step = make_be_gan_train_step(g_model, d_model)
    ds = SyntheticBubbleDataset(img_size=IMG)
    b = ds.sample_batch(2)
    g_leaf_before = np.asarray(
        jax.tree_util.tree_leaves(gs.g.params["mask_net"])[0])
    d_leaf_before = np.asarray(jax.tree_util.tree_leaves(gs.d.params)[0])
    gs2, metrics = step(
        gs, jnp.asarray(b["imgs"]), jnp.asarray(b["bimgs"]),
        jnp.asarray(b["eimgs"]), jnp.asarray(b["labels"]),
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    g_leaf_after = np.asarray(
        jax.tree_util.tree_leaves(gs2.g.params["mask_net"])[0])
    d_leaf_after = np.asarray(jax.tree_util.tree_leaves(gs2.d.params)[0])
    assert np.abs(g_leaf_after - g_leaf_before).max() > 0
    assert np.abs(d_leaf_after - d_leaf_before).max() > 0
