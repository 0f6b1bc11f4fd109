"""bf16 mixed-precision coverage for the remaining five train steps
(BE_GAN / BP / BCP / BE_font / Style_GAN): each family's fused step must run
with compute_dtype=bfloat16, produce finite metrics that agree with the f32
step at the SAME initial state (pure rounding difference), and keep every
master-state leaf float32 (utils/amp.py policy; SURVEY.md §7 bullet d).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')

from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam, torch_adam
from vaeplay_tpu.utils.jitting import jit_init

IMG = 64
B = 2


def _check(make_step, state, args, rel_tol=0.05):
    """Run one f32 and one bf16 step from the identical state; compare."""
    s32, m32 = make_step(None)(state, *args)
    s16, m16 = make_step(jnp.bfloat16)(state, *args)
    for k in m32:
        v32, v16 = float(m32[k]), float(m16[k])
        assert np.isfinite(v16), (k, v16)
        assert abs(v16 - v32) <= rel_tol * abs(v32) + 0.05, (k, v16, v32)
    for leaf in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x, s16)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_be_gan_bf16_step():
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.be_gan import ComposeNet, Discriminator
    from vaeplay_tpu.train.steps_be_gan import GanState, make_be_gan_train_step

    img = 128  # MaskMapper floor (networks_BE_GAN.py:79)
    g_model = ComposeNet()
    d_model = Discriminator(in_size=img, num_classes=4)
    x = jnp.zeros((1, img, img, 3))
    m = jnp.zeros((1, img, img, 1))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, x, m, m)
    gs = GanState(
        g=TrainState.create(g_model.apply, gv["params"], gv["batch_stats"],
                            frozen_backbone_adam(1e-4),
                            constants=gv.get("constants")),
        d=TrainState.create(d_model.apply, dv["params"], dv["batch_stats"],
                            torch_adam(1e-5, (0.5, 0.999))),
    )
    b = SyntheticBubbleDataset(img_size=img).sample_batch(B)
    args = tuple(jnp.asarray(b[k]) for k in ("imgs", "bimgs", "eimgs", "labels"))
    _check(lambda dt: make_be_gan_train_step(g_model, d_model, compute_dtype=dt),
           gs, args)


def test_bp_bf16_step():
    from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
    from vaeplay_tpu.models.bp import ComposeNet
    from vaeplay_tpu.train.steps_bp import make_bp_train_step

    small = ((16, 2), (32, 2), (64, 2), (64, 2), (64, 2), (64, 1), (64, 1))
    model = ComposeNet(image_size=IMG, emit_channels=small)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], None, torch_adam(1e-3))
    imgs, p1, p2 = SyntheticEmitDataset(img_size=IMG).sample_batch(B)
    args = (jnp.asarray(imgs), jnp.asarray(p1), jnp.asarray(p2))
    _check(lambda dt: make_bp_train_step(model, compute_dtype=dt), state, args)


def test_bcp_bf16_step():
    from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
    from vaeplay_tpu.models.bcp import ComposeNet, Discriminator
    from vaeplay_tpu.train.steps_be_gan import GanState
    from vaeplay_tpu.train.steps_bcp import make_bcp_train_step

    p = 64
    g_model = ComposeNet(image_size=IMG, pt_size=p)
    d_model = Discriminator(image_size=IMG, pt_size=p)
    x = jnp.zeros((1, IMG, IMG, 3))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x,
                  jnp.zeros((1, p, 2)), jnp.ones((1,), jnp.int32))
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, x,
                  jnp.zeros((1, p, 4)))
    gs = GanState(
        g=TrainState.create(g_model.apply, gv["params"], None, torch_adam(1e-3)),
        d=TrainState.create(d_model.apply, dv["params"], None, torch_adam(1e-3)),
    )
    b = SyntheticBCPDataset(img_size=IMG, max_points=p).sample_batch(B)
    args = tuple(jnp.asarray(b[k]) for k in ("imgs", "labels", "points", "pmask"))
    _check(lambda dt: make_bcp_train_step(g_model, d_model, compute_dtype=dt),
           gs, args)


def test_be_font_bf16_step():
    from vaeplay_tpu.data.font_data import SyntheticGlyphDataset
    from vaeplay_tpu.models.be_font import ComposeNet, Discriminator
    from vaeplay_tpu.train.steps_be_font import (
        create_font_state, make_be_font_train_step)

    g_model = ComposeNet(in_size=IMG)
    d_model = Discriminator(in_size=IMG)
    x = jnp.zeros((1, IMG, IMG, 3))
    y = {"cls": jnp.zeros((1, 143)), "cnt_style": jnp.zeros((1, 5))}
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x, y,
                  method=g_model.init_all)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)},
                  jnp.zeros((1, IMG, IMG, 2)), y)
    fs = create_font_state(g_model, d_model, gv, dv, 1e-4)
    batch = next(SyntheticGlyphDataset(data_size=B).batches(B, IMG))
    args = tuple(jnp.asarray(batch[k]) for k in
                 ("imgs", "masks", "edges", "labels", "styles"))
    _check(lambda dt: make_be_font_train_step(g_model, d_model, 1e-4,
                                              compute_dtype=dt), fs, args)


def test_style_gan_bf16_step():
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.style_gan import Discriminator, Generator, StyleEncoder
    from vaeplay_tpu.train.steps_style_gan import (
        StyleGanState, make_style_gan_train_step)

    z = 32
    e_model = StyleEncoder(z_dim=z, image_size=IMG)
    g_model = Generator(image_size=IMG, z_dim=z)
    d_model = Discriminator(image_size=IMG, num_classes=2)
    x = jnp.zeros((1, IMG, IMG, 3))
    ev = jit_init(e_model, {"params": jax.random.PRNGKey(0)}, x)
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(1)}, x,
                  jnp.zeros((1, z)), jnp.zeros((1,), jnp.int32))
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(2)}, x, x)
    ss = StyleGanState(
        e=TrainState.create(e_model.apply, ev["params"], None, torch_adam(1e-4)),
        g=TrainState.create(g_model.apply, gv["params"], None, torch_adam(1e-4)),
        d=TrainState.create(d_model.apply, dv["params"], None, torch_adam(1e-4)),
    )
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(B)
    args = (jnp.asarray(b["imgs"]),
            jnp.asarray(np.repeat(b["bimgs"], 3, axis=-1)),
            jnp.asarray((b["labels"] % 2).astype(np.int64)),
            jax.random.PRNGKey(7))
    # KL is a SUM over the batch (train_Style_GAN.py:218): O(1e3-1e4) with
    # bf16-computed mu/logvar — allow 10% relative on this one step
    _check(lambda dt: make_style_gan_train_step(e_model, g_model, d_model,
                                                z_dim=z, compute_dtype=dt),
           ss, args, rel_tol=0.10)
