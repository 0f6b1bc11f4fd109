"""One 8-device data-parallel train step per model family (VERDICT round-1
item 3): every family's fused step must run under a ("data", "model") mesh
with the batch sharded over "data" and params replicated, producing finite
losses and updated state — mirroring tests/test_vae_gan.py::test_dp_sharded_step
for the remaining seven families (SURVEY.md §2.3 DP row).

Sizes are the smallest that exercise each family's full stack; batch = 8 so
every virtual CPU device holds one sample.  Backbone-bearing families run the
SLIM backbone/encoder configs (same stage/stride/frozen-BN topology, fewer
blocks): what these tests verify is the sharded program STRUCTURE — full-size
numerics are covered by the per-family CPU tests and the weight-transplant
parity suite, and the full-depth 8-device programs were what pushed this
module against the XLA:CPU collective-rendezvous cliff (round-2 VERDICT
weak #6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')

from vaeplay_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam, torch_adam
from vaeplay_tpu.utils.jitting import jit_init

IMG = 64
B = 8


@pytest.fixture(autouse=True)
def _release_executables():
    """Each family's 8-device SPMD programs are large; keeping all of them
    alive in one process can abort the XLA:CPU runtime partway through the
    module (observed as a hard `Fatal Python error: Aborted` while fetching
    the 5th family's metrics).  Tests in this module never reuse another
    test's compiled step, so dropping the compilation cache between tests
    costs nothing and keeps the runtime's live-executable set bounded."""
    yield
    jax.clear_caches()


def _finite(metrics):
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def _first_leaf(tree):
    return np.asarray(jax.tree_util.tree_leaves(tree)[0])


def test_be_dp_step(eight_devices):
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.be import ComposeNet
    from vaeplay_tpu.train.steps_be import make_be_train_step

    model = ComposeNet(backbone_layers=(1, 1, 1, 1), backbone_width=16)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], v["batch_stats"],
                              frozen_backbone_adam(1e-4),
                              constants=v.get("constants"))
    mesh = create_mesh()
    state = replicate(mesh, state)
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(B)
    imgs, bimgs, eimgs = shard_batch(mesh, (b["imgs"], b["bimgs"], b["eimgs"]))
    step = make_be_train_step(model)
    state, metrics = step(state, imgs, bimgs, eimgs)
    _finite(metrics)
    assert int(jax.device_get(state.step)) == 1
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_be_gan_dp_step(eight_devices):
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.be_gan import ComposeNet, Discriminator
    from vaeplay_tpu.train.steps_be_gan import GanState, make_be_gan_train_step

    img = 128  # BE_GAN's MaskMapper needs >= 128 px (networks_BE_GAN.py:79)
    g_model = ComposeNet(backbone_layers=(1, 1, 1, 1), backbone_width=16)
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
    mesh = create_mesh()
    gs = replicate(mesh, gs)
    b = SyntheticBubbleDataset(img_size=img).sample_batch(B)
    imgs, bimgs, eimgs, labels = shard_batch(
        mesh, (b["imgs"], b["bimgs"], b["eimgs"], b["labels"]))
    step = make_be_gan_train_step(g_model, d_model)  # two-program GAN split
    gs2, metrics = step(gs, imgs, bimgs, eimgs, labels)
    _finite(metrics)
    assert np.abs(_first_leaf(gs2.d.params) - _first_leaf(gs.d.params)).max() > 0


def test_bp_dp_step(eight_devices):
    from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
    from vaeplay_tpu.models.bp import ComposeNet
    from vaeplay_tpu.train.steps_bp import make_bp_train_step

    small = ((16, 2), (32, 2), (64, 2), (64, 2), (64, 2), (64, 1), (64, 1))
    model = ComposeNet(image_size=IMG, emit_channels=small)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], None, torch_adam(1e-3))
    mesh = create_mesh()
    state = replicate(mesh, state)
    imgs, p1, p2 = SyntheticEmitDataset(img_size=IMG).sample_batch(B)
    imgs, p1, p2 = shard_batch(mesh, (imgs, p1, p2))
    step = make_bp_train_step(model)
    state, metrics = step(state, imgs, p1, p2)
    _finite(metrics)
    assert int(jax.device_get(state.step)) == 2  # two optimizer passes


def test_bc_dp_step_external_bridge(eight_devices):
    """BC under DP with the axon-style external-contour bridge: stage A
    sharded, host trace, stage B sharded."""
    from vaeplay_tpu.data.bc_data import SyntheticBCDataset
    from vaeplay_tpu.models.bc import ComposeNet
    from vaeplay_tpu.train.steps_bc import (
        BridgeTracer, make_bc_mask_step, make_bc_train_step)

    mp, stride = 64, 4
    model = ComposeNet(max_points=mp, backbone_layers=(1, 1, 1, 1),
                       backbone_width=16)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, IMG, IMG, 3)))
    state = TrainState.create(model.apply, v["params"], v["batch_stats"],
                              frozen_backbone_adam(1e-4),
                              constants=v.get("constants"))
    mesh = create_mesh()
    state = replicate(mesh, state)
    b = SyntheticBCDataset(img_size=IMG, max_points=mp).sample_batch(B)
    tensors = shard_batch(mesh, (
        b["imgs"], b["bimgs"], b["eimgs"], b["tgt_pts"], b["tgt_mask"],
        b["key_pts"], b["key_mask"]))
    packed = make_bc_mask_step(model, stride=stride)(state, tensors[0])
    pts, counts = BridgeTracer(IMG, stride, mp).trace(jax.device_get(packed))
    pts_d, counts_d = shard_batch(mesh, (pts, counts))
    step = make_bc_train_step(model, max_points=mp, external_contours=True)
    state, metrics = step(state, tensors[0], pts_d, counts_d, *tensors[1:])
    _finite(metrics)
    assert int(jax.device_get(state.step)) == 1


def test_bcp_dp_step(eight_devices):
    from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
    from vaeplay_tpu.models.bcp import ComposeNet, Discriminator
    from vaeplay_tpu.train.steps_be_gan import GanState
    from vaeplay_tpu.train.steps_bcp import make_bcp_train_step

    p = 64
    g_model = ComposeNet(image_size=IMG, pt_size=p, encoder_blocks=2,
                         encoder_out_size=16)
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
    mesh = create_mesh()
    gs = replicate(mesh, gs)
    b = SyntheticBCPDataset(img_size=IMG, max_points=p).sample_batch(B)
    imgs, labels, points, pmask = shard_batch(
        mesh, (b["imgs"], b["labels"], b["points"], b["pmask"]))
    step = make_bcp_train_step(g_model, d_model)
    gs2, metrics = step(gs, imgs, labels, points, pmask)
    _finite(metrics)
    assert np.abs(_first_leaf(gs2.g.params) - _first_leaf(gs.g.params)).max() > 0


def test_be_font_dp_step(eight_devices):
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
    mesh = create_mesh()
    fs = replicate(mesh, fs)
    batch = next(SyntheticGlyphDataset(data_size=B).batches(B, IMG))
    imgs, masks, edges, labels, styles = shard_batch(
        mesh, (batch["imgs"], batch["masks"], batch["edges"],
               batch["labels"], batch["styles"]))
    step = make_be_font_train_step(g_model, d_model, lr=1e-4)
    fs2, metrics = step(fs, imgs, masks, edges, labels, styles)
    _finite(metrics)
    assert np.abs(_first_leaf(fs2.g.params) - _first_leaf(fs.g.params)).max() > 0


def test_style_gan_dp_step(eight_devices):
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
    mesh = create_mesh()
    ss = replicate(mesh, ss)
    b = SyntheticBubbleDataset(img_size=IMG).sample_batch(B)
    x_target, x_content, labels = shard_batch(mesh, (
        b["imgs"], np.repeat(b["bimgs"], 3, axis=-1),
        (b["labels"] % 2).astype(np.int64)))
    step = make_style_gan_train_step(e_model, g_model, d_model, z_dim=z)
    ss2, metrics = step(ss, x_target, x_content, labels, jax.random.PRNGKey(7))
    _finite(metrics)
    for name, old, new in (("e", ss.e, ss2.e), ("g", ss.g, ss2.g),
                           ("d", ss.d, ss2.d)):
        assert np.abs(_first_leaf(new.params) - _first_leaf(old.params)).max() > 0, name
