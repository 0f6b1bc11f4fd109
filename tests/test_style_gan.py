"""Style_GAN tests: generator/encoder/discriminator shapes + fused 3-net step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
from vaeplay_tpu.models.style_gan import Discriminator, Generator, StyleEncoder
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.train.steps_style_gan import StyleGanState, make_style_gan_train_step
from vaeplay_tpu.utils.jitting import jit_init

IMG = 64
Z = 64


@pytest.fixture(scope="module")
def sg_state():
    e_model = StyleEncoder(z_dim=Z, image_size=IMG)
    g_model = Generator(image_size=IMG, z_dim=Z)
    d_model = Discriminator(image_size=IMG, num_classes=2)
    x = jnp.zeros((1, IMG, IMG, 3))
    z = jnp.zeros((1, Z))
    y = jnp.zeros((1,), jnp.int32)
    ev = jit_init(e_model, {"params": jax.random.PRNGKey(0)}, x)
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(1)}, x, z, y)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(2)}, x, x)
    e = TrainState.create(e_model.apply, ev["params"], None, torch_adam(1e-4))
    g = TrainState.create(g_model.apply, gv["params"], None, torch_adam(1e-4))
    d = TrainState.create(d_model.apply, dv["params"], None, torch_adam(1e-4))
    return (e_model, g_model, d_model), StyleGanState(e=e, g=g, d=d)


def test_style_gan_shapes(sg_state):
    (e_model, g_model, d_model), ss = sg_state
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, IMG, IMG, 3))
    mu, logvar = e_model.apply({"params": ss.e.params}, x, train=True)
    assert mu.shape == (2, Z) and logvar.shape == (2, Z)
    z = jax.random.normal(jax.random.PRNGKey(4), (2, Z))
    y = jnp.asarray([0, 1])
    out = g_model.apply({"params": ss.g.params}, x, z, y, train=True)
    assert out.shape == (2, IMG, IMG, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh head
    adv, aux = d_model.apply({"params": ss.d.params}, x, x, train=True)
    assert adv.shape == (2, 1)
    assert aux.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(aux.sum(-1)), 1.0, rtol=1e-5)


def test_label_gating_changes_output(sg_state):
    (e_model, g_model, d_model), ss = sg_state
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, IMG, IMG, 3))
    z = jax.random.normal(jax.random.PRNGKey(6), (1, Z))
    out0 = g_model.apply({"params": ss.g.params}, x, z, jnp.asarray([0]), train=True)
    out1 = g_model.apply({"params": ss.g.params}, x, z, jnp.asarray([1]), train=True)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_style_gan_train_step(sg_state):
    (e_model, g_model, d_model), ss = sg_state
    step = make_style_gan_train_step(e_model, g_model, d_model, z_dim=Z)
    ds = SyntheticBubbleDataset(img_size=IMG)
    b = ds.sample_batch(2)
    x_target = jnp.asarray(b["imgs"])
    x_content = jnp.asarray(np.repeat(b["bimgs"], 3, axis=-1))
    labels = jnp.asarray(b["labels"] % 2)
    ss2, metrics = step(ss, x_target, x_content, labels, jax.random.PRNGKey(7))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    for name, old, new in (("e", ss.e, ss2.e), ("g", ss.g, ss2.g), ("d", ss.d, ss2.d)):
        a = np.asarray(jax.tree_util.tree_leaves(old.params)[0])
        bb = np.asarray(jax.tree_util.tree_leaves(new.params)[0])
        assert np.abs(bb - a).max() > 0, f"{name} params did not update"
