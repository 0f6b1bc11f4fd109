"""BE family tests: backbone pyramid, compose net shapes, fused train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaeplay_tpu.data.be_data import SyntheticBubbleDataset, decode_layer_mask
from vaeplay_tpu.models.backbone import ResNetFPN
from vaeplay_tpu.models.be import ComposeNet
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
from vaeplay_tpu.train.steps_be import make_be_train_step


@pytest.fixture(scope="module")
def be_state():
    # slim backbone for the fast tier (full topology: slow-tier
    # trajectory gate test_parity_trajectory_be)
    model = ComposeNet(backbone_layers=(1, 1, 1, 1), backbone_width=16)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    tx = frozen_backbone_adam(1e-4)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx,
        constants=variables.get("constants"),
    )
    return model, state


def test_backbone_pyramid_shapes():
    model = ResNetFPN()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert outs["0"].shape == (1, 16, 16, 256)   # stride 4
    assert outs["1"].shape == (1, 8, 8, 256)     # stride 8
    assert outs["2"].shape == (1, 4, 4, 256)     # stride 16
    assert outs["3"].shape == (1, 2, 2, 256)     # stride 32
    assert outs["pool"].shape == (1, 1, 1, 256)


def test_compose_net_full_resolution(be_state):
    model, state = be_state
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    preds = model.apply(state.variables(), x, train=False)
    # stride-4 features ×2 Up = full resolution (networks_BE.py:43-45)
    assert preds["masks"].shape == (2, 64, 64, 1)
    assert preds["edges"].shape == (2, 64, 64, 1)


def test_be_train_step_and_frozen_backbone(be_state):
    model, state = be_state
    step = make_be_train_step(model)
    ds = SyntheticBubbleDataset(img_size=64)
    batch = ds.sample_batch(2)
    stem_before = np.asarray(
        state.params["feature_net"]["backbone"]["body"]["conv1"]["kernel"]
    )
    layer2_before = np.asarray(
        jax.tree_util.tree_leaves(
            state.params["feature_net"]["backbone"]["body"]["layer2_block0"]
        )[0]
    )
    state, metrics = step(
        state, jnp.asarray(batch["imgs"]), jnp.asarray(batch["bimgs"]),
        jnp.asarray(batch["eimgs"]),
    )
    assert np.isfinite(float(metrics["loss_edge"]))
    assert np.isfinite(float(metrics["loss_mask"]))
    stem_after = np.asarray(
        state.params["feature_net"]["backbone"]["body"]["conv1"]["kernel"]
    )
    layer2_after = np.asarray(
        jax.tree_util.tree_leaves(
            state.params["feature_net"]["backbone"]["body"]["layer2_block0"]
        )[0]
    )
    # torchvision trainable_layers=3: stem/layer1 frozen, layer2+ train
    np.testing.assert_array_equal(stem_before, stem_after)
    assert np.abs(layer2_after - layer2_before).max() > 0


def test_decode_layer_mask():
    m = np.zeros((4, 4, 3), np.uint8)
    m[0, 0] = (255, 255, 255)  # white bg → cleared
    m[1, 1] = (255, 0, 0)      # content
    m[2, 2] = (0, 255, 0)      # edge
    b, e = decode_layer_mask(m)
    assert b[0, 0] == 0 and e[0, 0] == 0
    assert b[1, 1] == 1.0 and e[1, 1] == 0.0
    assert b[2, 2] == 0.0 and e[2, 2] == 1.0


def test_packed_eval_step_matches_thresholded_probs(be_state):
    """Serving contract: the bit-packed eval step unpacks to exactly the
    0.5-thresholded probability maps of the plain eval step (the threshold
    moves on-device as a logits >= 0 compare — sigmoid is monotonic with
    sigmoid(0) = 0.5)."""
    from vaeplay_tpu.eval.predictor import make_packed_be_predict
    from vaeplay_tpu.train.steps_be import make_be_eval_step

    model, state = be_state
    imgs = jnp.asarray(
        SyntheticBubbleDataset(img_size=64).sample_batch(3)["imgs"])
    probs = jax.device_get(make_be_eval_step(model)(state, imgs))
    predict = make_packed_be_predict(model, state, 64)
    binary = predict(np.asarray(imgs))
    for k in ("masks", "edges"):
        assert binary[k].shape == probs[k].shape
        assert binary[k].dtype == np.float32
        np.testing.assert_array_equal(
            binary[k], (probs[k] >= 0.5).astype(np.float32))


def test_packed_predict_buckets_and_slices(be_state):
    """Odd batch sizes pad to the power-of-two bucket and slice back."""
    from vaeplay_tpu.eval.predictor import make_packed_be_predict

    model, state = be_state
    imgs = SyntheticBubbleDataset(img_size=64).sample_batch(5)["imgs"]
    out5 = make_packed_be_predict(model, state, 64)(imgs)
    assert out5["masks"].shape == (5, 64, 64, 1)
    out1 = make_packed_be_predict(model, state, 64)(imgs[:1])
    np.testing.assert_array_equal(out5["masks"][:1], out1["masks"])


def test_frozen_gradient_cut_preserves_updates(be_state, monkeypatch):
    """stop_frozen_gradients (train/state.py) must change no parameter
    update: the optimizer mask already zeroes the frozen conv1/layer1 grads,
    the cut only lets XLA dead-code their backward."""
    import vaeplay_tpu.train.steps_be as steps_be

    model, state = be_state
    ds = SyntheticBubbleDataset(img_size=64)
    batch = ds.sample_batch(2)
    imgs = jnp.asarray(batch["imgs"])
    bimgs = jnp.asarray(batch["bimgs"])
    eimgs = jnp.asarray(batch["eimgs"])

    step_cut = steps_be.make_be_train_step(model)
    with monkeypatch.context() as m:
        m.setattr(steps_be, "stop_frozen_gradients", lambda p: p)
        step_nocut = steps_be.make_be_train_step(model)
        # jit traces at the first CALL — invoke inside the patch context so
        # the no-cut variant actually traces with the identity stand-in
        # (round-2 ADVICE: calling it after the context compared cut vs cut)
        s2, m2 = step_nocut(state, imgs, bimgs, eimgs)

    s1, m1 = step_cut(state, imgs, bimgs, eimgs)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(m1["loss_mask"]), float(m2["loss_mask"]),
                               rtol=0, atol=0)


def test_device_bubble_render_matches_host():
    """render_bubble_batch (device-side, feeds the --scan_steps training
    path) matches SyntheticBubbleDataset.sample_batch on the same rng
    stream.  Boundary pixels may quantize differently (the host renderer's
    distance test runs in float64, the device one in float32), so masks
    must agree everywhere except a thin boundary set."""
    import numpy as np

    from vaeplay_tpu.data.be_data import (
        SyntheticBubbleDataset, render_bubble_batch, sample_bubble_params)

    n, b = 64, 4
    host = SyntheticBubbleDataset(img_size=n, seed=3).sample_batch(
        b, batch_seed=17)
    params, labels = sample_bubble_params(n, b, seed=3, batch_seed=17)
    np.testing.assert_array_equal(labels, host["labels"])
    imgs, bimgs, eimgs = render_bubble_batch(n, jnp.asarray(params))
    for dev, ref in ((bimgs, host["bimgs"]), (eimgs, host["eimgs"])):
        diff = np.asarray(dev) != ref
        assert diff.mean() < 2e-3, diff.mean()  # f32-vs-f64 boundary pixels
    agree = np.isclose(np.asarray(imgs), host["imgs"]).mean()
    assert agree > 1 - 2e-3, agree
