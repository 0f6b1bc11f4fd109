"""BC family tests: host-contour callback inside jit, shapes, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.data.bc_data import SyntheticBCDataset
from vaeplay_tpu.models.bc import ComposeNet
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
from vaeplay_tpu.train.steps_bc import make_bc_train_step
from vaeplay_tpu.utils.jitting import jit_init

IMG = 64
MP = 64


@pytest.fixture(scope="module")
def bc_state():
    # slim backbone for the fast tier: what these tests gate is the
    # contour-bridge/step STRUCTURE; the full resnet50 topology is
    # covered by the slow-tier trajectory gate (test_parity_trajectory_bc)
    model = ComposeNet(max_points=MP, backbone_layers=(1, 1, 1, 1),
                       backbone_width=16)
    x = jnp.zeros((1, IMG, IMG, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, x)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"],
        frozen_backbone_adam(1e-4), constants=variables.get("constants"),
    )
    return model, state


def test_bc_forward_contours_inside_jit(bc_state):
    model, state = bc_state
    ds = SyntheticBCDataset(img_size=IMG, max_points=MP)
    batch = ds.sample_batch(2)

    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, train=False)

    preds = forward(state.variables(), jnp.asarray(batch["imgs"]))
    assert preds["masks"].shape == (2, IMG, IMG, 1)
    assert preds["edges"].shape == (2, IMG, IMG, 1)
    assert preds["contours"].shape == (2, MP, 2)
    assert preds["contour_regressions"].shape == (2, MP, 2)
    counts = np.asarray(preds["contour_counts"])
    assert counts.shape == (2,)
    # contour coords are in the padded full-res frame
    pts = np.asarray(preds["contours"])
    assert pts.min() >= 0 and pts.max() <= IMG + 1


def test_bc_train_step(bc_state):
    model, state = bc_state
    step = make_bc_train_step(model, max_points=MP)
    ds = SyntheticBCDataset(img_size=IMG, max_points=MP)
    b = ds.sample_batch(2)
    state, metrics = step(
        state, jnp.asarray(b["imgs"]), jnp.asarray(b["bimgs"]),
        jnp.asarray(b["eimgs"]), jnp.asarray(b["tgt_pts"]),
        jnp.asarray(b["tgt_mask"]), jnp.asarray(b["key_pts"]),
        jnp.asarray(b["key_mask"]),
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 1


def test_synthetic_bc_targets():
    ds = SyntheticBCDataset(img_size=IMG, max_points=MP)
    b = ds.sample_batch(3)
    assert b["tgt_pts"].shape == (3, MP, 2)
    assert b["tgt_mask"].sum() > 0
    assert b["key_mask"].sum() > 0
    # key contour is a subset-ish simplification: fewer points than full
    assert b["key_mask"].sum() <= b["tgt_mask"].sum()


def test_refine_fc_bf16_parity():
    """The bfloat16 FC working point (the reference's 256-pt capacity on one
    chip) must agree with f32 to ~1e-2 relative on identical weights."""
    from vaeplay_tpu.models.bc import RefineNet

    mp, feat = 16, 34
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, mp, feat), jnp.float32) * 0.3
    m32 = RefineNet(max_points=mp, feat_size=feat)
    v = m32.init({"params": key}, x, train=False)
    m16 = RefineNet(max_points=mp, feat_size=feat, fc_dtype="bfloat16")
    p16 = jax.tree_util.tree_map(lambda a: a, v["params"])
    for name in ("fc0", "fc1"):
        p16[name] = {k: a.astype(jnp.bfloat16) for k, a in p16[name].items()}
    y32 = m32.apply(v, x, train=False)
    y16 = m16.apply({**v, "params": p16}, x, train=False)
    assert y16.dtype == jnp.float32  # cast back at the boundary
    scale = float(jnp.abs(y32).max()) + 1e-6
    rel = float(jnp.abs(y32 - y16).max()) / scale
    assert rel < 1e-2, rel


def test_strided_mask_bits_trace_accuracy():
    """Stride-4 bit-packed stage-A output traces to the same contour as the
    full-resolution mask within the stride quantization."""
    from vaeplay_tpu.models.bc import pack_mask_bits
    from vaeplay_tpu.ops.contour import batch_find_contours
    from vaeplay_tpu.train.steps_bc import unpack_mask_bits

    h = w = 128
    ys, xs = np.mgrid[0:h, 0:w]
    mask = ((((xs - 66.0) / 40.0) ** 2 + ((ys - 60.0) / 30.0) ** 2) <= 1.0)
    mask = mask.astype(np.uint8)[None]

    def roundtrip(m, stride):
        sub = m[:, ::stride, ::stride]
        packed = np.asarray(pack_mask_bits(jnp.asarray(sub)))
        rec = unpack_mask_bits(packed, sub.shape[2])
        np.testing.assert_array_equal(rec, sub.astype(np.float32))
        pts, counts = batch_find_contours(rec, max_points=256)
        return pts[0, :counts[0]] * stride, counts[0]

    full, n_full = roundtrip(mask, 1)
    coarse, n_coarse = roundtrip(mask, 4)
    assert n_full > 0 and n_coarse > 0
    d = np.hypot(coarse[:, None, 0] - full[None, :, 0],
                 coarse[:, None, 1] - full[None, :, 1]).min(axis=1)
    assert d.max() <= 4 * 1.5 + 1.0, d.max()


def test_bc_external_bridge_train_step(bc_state):
    """The two-program strided bridge end to end: stage A (stride 4) →
    host trace → external train step, finite losses."""
    from vaeplay_tpu.train.steps_bc import (
        BridgeTracer, make_bc_mask_step, strided_mask_width, unpack_mask_bits)

    model, state = bc_state
    ds = SyntheticBCDataset(img_size=IMG, max_points=MP)
    b = ds.sample_batch(2)
    imgs = jnp.asarray(b["imgs"])
    stride = 4
    mask_step = make_bc_mask_step(model, stride=stride)
    packed = mask_step(state, imgs)
    mask_w = strided_mask_width(IMG, stride)
    masks = unpack_mask_bits(packed, mask_w)
    assert masks.shape == (2, mask_w, mask_w)
    # BridgeTracer.trace = the same unpack + trace + rescale the CLIs use
    pts, counts = BridgeTracer(IMG, stride, MP).trace(packed)
    step = make_bc_train_step(model, max_points=MP, external_contours=True)
    state2, metrics = step(
        state, imgs, jnp.asarray(pts), jnp.asarray(counts),
        jnp.asarray(b["bimgs"]), jnp.asarray(b["eimgs"]),
        jnp.asarray(b["tgt_pts"]), jnp.asarray(b["tgt_mask"]),
        jnp.asarray(b["key_pts"]), jnp.asarray(b["key_mask"]),
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state2.step) == int(state.step) + 1


@pytest.mark.slow  # heavy full-model run; fast-tier budget (round-5 VERDICT item 6)
def test_bc_dp_tp_sharded_step(eight_devices):
    """BC under a 4x2 (data x model) mesh: the RefineNet FC kernel — 545M
    params at the reference 256-pt capacity, the reason round 1 ran at half
    capacity — tensor-shards over "model" (the multi-chip alternative to the
    bf16 working point), batch shards over "data", and the external-bridge
    train step runs with finite losses."""
    from vaeplay_tpu.ops.contour import batch_find_contours
    from vaeplay_tpu.parallel.mesh import (
        create_mesh, replicate, shard_batch, shard_params)
    from vaeplay_tpu.train.steps_bc import (
        make_bc_mask_step, make_bc_train_step, unpack_mask_bits)

    model = ComposeNet(max_points=MP)
    x = jnp.zeros((1, IMG, IMG, 3))
    v = jit_init(model, {"params": jax.random.PRNGKey(0)}, x)
    state = TrainState.create(
        model.apply, v["params"], v["batch_stats"], frozen_backbone_adam(1e-4),
        constants=v.get("constants"))
    mesh = create_mesh(n_data=4, n_model=2)
    state = replicate(mesh, state)
    state = state.replace(params=shard_params(mesh, state.params),
                          opt_state=shard_params(mesh, state.opt_state))
    fc0 = state.params["refine_net"]["fc0"]["kernel"]
    spec = fc0.sharding.spec
    assert tuple(spec) == (None, "model"), spec  # actually tensor-sharded

    b = SyntheticBCDataset(img_size=IMG, max_points=MP).sample_batch(8)
    tensors = shard_batch(mesh, (
        b["imgs"], b["bimgs"], b["eimgs"], b["tgt_pts"], b["tgt_mask"],
        b["key_pts"], b["key_mask"]))
    packed = make_bc_mask_step(model)(state, tensors[0])
    masks = unpack_mask_bits(jax.device_get(packed), IMG + 2)
    pts, counts = batch_find_contours(masks, max_points=MP, threshold=0.5)
    pts_d, counts_d = shard_batch(mesh, (pts, counts))
    step = make_bc_train_step(model, max_points=MP, external_contours=True)
    state2, metrics = step(state, tensors[0], pts_d, counts_d, *tensors[1:])
    for k, val in metrics.items():
        assert np.isfinite(float(val)), (k, float(val))
    # the update must preserve the tensor sharding (no silent all-gather
    # into replicated storage)
    fc0_2 = state2.params["refine_net"]["fc0"]["kernel"]
    assert tuple(fc0_2.sharding.spec) == (None, "model")


def test_make_embedding_tensor_one_hot_planes():
    """CASE-2 pathway (networks_BC.py:39-52): one plane per valid point with
    a single 1 at its (y, x); padded points produce all-zero planes."""
    from vaeplay_tpu.models.bc import make_embedding_tensor

    pts = jnp.asarray([[[1.0, 2.0], [3.0, 0.0], [9.0, 9.0]],
                       [[0.0, 0.0], [5.0, 5.0], [2.0, 1.0]]])
    counts = jnp.asarray([2, 1])
    planes = np.asarray(make_embedding_tensor(pts, counts, 4, 4))
    assert planes.shape == (2, 3, 4, 4)
    # sample 0: two valid points at (y=2, x=1) and (y=0, x=3)
    assert planes[0, 0, 2, 1] == 1.0 and planes[0, 0].sum() == 1.0
    assert planes[0, 1, 0, 3] == 1.0 and planes[0, 1].sum() == 1.0
    assert planes[0, 2].sum() == 0.0  # padded point -> zero plane
    # sample 1: only the first point valid; coords clipped into range
    assert planes[1, 0, 0, 0] == 1.0 and planes[1, 0].sum() == 1.0
    assert planes[1, 1].sum() == 0.0 and planes[1, 2].sum() == 0.0
