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
    model = ComposeNet(max_points=MP)
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
