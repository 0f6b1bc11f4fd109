"""BE_font family tests: U-Net shapes, conditioning paths, 3-phase step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.data.font_data import SyntheticGlyphDataset
from vaeplay_tpu.models.be_font import ComposeNet, Discriminator
from vaeplay_tpu.train.steps_be_font import (
    create_font_state, make_be_font_train_step,
)
from vaeplay_tpu.utils.jitting import jit_init

IMG = 32  # fast tier; the reference 64px model is covered by
          # the slow-tier trajectory gate (test_parity_trajectory_be_font)


@pytest.fixture(scope="module")
def font_state():
    g_model = ComposeNet(in_size=IMG)
    d_model = Discriminator(in_size=IMG)
    x = jnp.zeros((1, IMG, IMG, 3))
    y = {"cls": jnp.zeros((1, 143)), "cnt_style": jnp.zeros((1, 5))}
    m2 = jnp.zeros((1, IMG, IMG, 2))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x, y,
                  method=g_model.init_all)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, m2, y)
    return g_model, d_model, create_font_state(g_model, d_model, gv, dv, 1e-4)


def test_font_generator_both_conditioning_paths(font_state):
    g_model, _, fs = font_state
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, IMG, IMG, 3))
    y = {"cls": jax.nn.one_hot(jnp.asarray([3, 7]), 143),
         "cnt_style": jnp.ones((2, 5))}
    variables = {"params": fs.g.params, "batch_stats": fs.g.batch_stats}
    preds, _ = g_model.apply(variables, x, y=y, train=True, mutable=["batch_stats"])
    assert preds["masks"].shape == (2, IMG, IMG, 1)
    assert preds["edges"].shape == (2, IMG, IMG, 1)
    # eval path: style self-encoded from the image (networks_BE_font.py:188-193)
    preds2, _ = g_model.apply(variables, x, y=None, train=True,
                              mutable=["batch_stats"])
    assert preds2["masks"].shape == (2, IMG, IMG, 1)
    assert not np.allclose(np.asarray(preds["masks"]), np.asarray(preds2["masks"]))


def test_font_three_phase_step(font_state):
    g_model, d_model, fs = font_state
    step = make_be_font_train_step(g_model, d_model, lr=1e-4)
    ds = SyntheticGlyphDataset(data_size=8)
    batch = next(ds.batches(2, IMG))
    g_before = np.asarray(
        jax.tree_util.tree_leaves(fs.g.params["mask_net"])[0])
    style_before = np.asarray(
        jax.tree_util.tree_leaves(fs.g.params["style_encoder"])[0])
    embed_before = np.asarray(
        jax.tree_util.tree_leaves(fs.g.params["embeding_block"])[0])
    fs2, metrics = step(
        fs, jnp.asarray(batch["imgs"]), jnp.asarray(batch["masks"]),
        jnp.asarray(batch["edges"]), jnp.asarray(batch["labels"]),
        jnp.asarray(batch["styles"]),
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    g_after = np.asarray(jax.tree_util.tree_leaves(fs2.g.params["mask_net"])[0])
    style_after = np.asarray(
        jax.tree_util.tree_leaves(fs2.g.params["style_encoder"])[0])
    embed_after = np.asarray(
        jax.tree_util.tree_leaves(fs2.g.params["embeding_block"])[0])
    assert np.abs(g_after - g_before).max() > 0          # phase G updated heads
    assert np.abs(style_after - style_before).max() > 0  # phase S updated style
    assert np.abs(embed_after - embed_before).max() > 0  # phase G updated embed


def test_synthetic_glyph_batch_shapes():
    ds = SyntheticGlyphDataset(data_size=4)
    b = next(ds.batches(4, IMG))
    assert b["imgs"].shape == (4, IMG, IMG, 3)
    assert b["masks"].shape == (4, IMG, IMG, 1)
    assert b["edges"].shape == (4, IMG, IMG, 1)
    assert b["styles"].shape == (4, 5)
    assert b["masks"].max() > 0  # glyphs actually rendered
