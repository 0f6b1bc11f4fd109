"""BP family tests: ellipse sampling parity, model shapes, fused 2-phase step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
from vaeplay_tpu.models.bp import SAMPLE_COUNT, ComposeNet
from vaeplay_tpu.ops.geometry import sample_points_ellipse
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.train.steps_bp import make_bp_train_step
from vaeplay_tpu.utils.jitting import jit_init

SMALL = ((16, 2), (32, 2), (64, 2), (64, 2), (64, 2), (64, 1), (64, 1))


def test_sample_points_ellipse_matches_torch_reference():
    """Vectorized sampler == a direct numpy port of networks_BP.py:154-174."""
    cx, cy, rx, ry = 0.1, -0.2, 0.5, 0.3
    ds = np.arange(SAMPLE_COUNT)
    radians = ds / 2 * np.pi / 180
    pxs = cx + rx * np.cos(radians)
    pys = cy + ry * np.sin(radians)
    dpxs = rx * -np.sin(radians)
    dpys = ry * np.cos(radians)
    l = np.sqrt(dpxs**2 + dpys**2)
    dpxs, dpys = dpxs / l, dpys / l
    rot = -np.pi / 2
    tx = dpxs * np.cos(rot) - dpys * np.sin(rot)
    ty = dpxs * np.sin(rot) + dpys * np.cos(rot)
    expected = np.stack([pxs, pys, tx, ty, ds, radians], axis=-1)

    got = np.asarray(
        sample_points_ellipse(jnp.asarray([[cx, cy, rx, ry, 4.0]]))
    )[0]
    np.testing.assert_allclose(got, expected, atol=1e-5)


@pytest.fixture(scope="module")
def bp_state():
    model = ComposeNet(image_size=64, emit_channels=SMALL)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, x)
    state = TrainState.create(model.apply, variables["params"], None, torch_adam(1e-3))
    return model, state


def test_bp_forward_shapes(bp_state):
    model, state = bp_state
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    preds = model.apply({"params": state.params}, x, train=True)
    assert preds["ellipse_params"].shape == (2, 5)
    assert preds["if_triggers"].shape == (2, SAMPLE_COUNT, 2)
    assert preds["line_params"].shape == (2, SAMPLE_COUNT, 4)
    assert preds["sample_infos"].shape == (2, SAMPLE_COUNT, 6)


def test_bp_stage2_detached(bp_state):
    """Stage-2 losses must not backprop into the stage-1 encoder/predictor
    (the .detach() at networks_BP.py:256)."""
    model, state = bp_state
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))

    def stage2_loss(params):
        preds = model.apply({"params": params}, x, train=True)
        return jnp.sum(preds["line_params"]) + jnp.sum(preds["if_triggers"])

    grads = jax.grad(stage2_loss)(state.params)
    import optax
    enc_norm = float(optax.global_norm(grads["encoder"]))
    ell_norm = float(optax.global_norm(grads["ellipse_predictor"]))
    emit_norm = float(optax.global_norm(grads["emit_line_predictor"]))
    assert enc_norm == 0.0 and ell_norm == 0.0
    assert emit_norm > 0.0


def test_bp_train_step(bp_state):
    model, state = bp_state
    step = make_bp_train_step(model)
    ds = SyntheticEmitDataset(img_size=64)
    imgs, p1, p2 = ds.sample_batch(2)
    state, metrics = step(
        state, jnp.asarray(imgs), jnp.asarray(p1), jnp.asarray(p2)
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 2  # two optimizer passes per iteration
