"""Checkpoint save/restore round-trip fidelity."""

import os
import tempfile

import pytest

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.models.vae_gan import VaeGan
from vaeplay_tpu.train.checkpoint import Checkpointer, make_run_dir
from vaeplay_tpu.train.state import TrainState, grouped_transform, torch_rmsprop
from vaeplay_tpu.utils.jitting import jit_init


def test_roundtrip_preserves_values_and_structure():
    model = VaeGan(img_size=64, z_size=16)
    x = jnp.zeros((2, 64, 64, 1))
    variables = jit_init(
        model, {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, x
    )
    tx = grouped_transform(
        {k: torch_rmsprop(1e-4) for k in
         ("encoder", "decoder", "discriminator", "param_encoder")},
        variables["params"],
    )
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    tree = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}
    with tempfile.TemporaryDirectory() as d:
        ck = Checkpointer(d)
        ck.save(3, tree)
        assert ck.latest() == 3
        restored = ck.restore(3, template=jax.device_get(tree))
        flat1, tdef1 = jax.tree_util.tree_flatten(tree)
        flat2, tdef2 = jax.tree_util.tree_flatten(restored)
        assert tdef1 == tdef2, "restored tree structure differs"
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_dir_layout():
    with tempfile.TemporaryDirectory() as d:
        p = make_run_dir(d, "BE", timestamp="20990101-000000")
        assert p == os.path.join(d, "BE", "20990101-000000")
        assert os.path.isdir(p)


def _toy_train_state(seed: float, with_bn: bool = True, tx=None):
    import optax
    from vaeplay_tpu.train.state import torch_adam

    params = {"net": {"kernel": jnp.full((3, 4), seed), "bias": jnp.full((4,), -seed)}}
    bn = {"net": {"mean": jnp.full((4,), seed * 2)}} if with_bn else None
    return TrainState.create(None, params, bn, tx or torch_adam(1e-3))


def _assert_states_equal(a, b):
    from flax import serialization

    # compare the dynamic state only (tx/apply_fn statics differ by identity)
    flat1, tdef1 = jax.tree_util.tree_flatten(serialization.to_state_dict(a))
    flat2, tdef2 = jax.tree_util.tree_flatten(serialization.to_state_dict(b))
    assert tdef1 == tdef2
    for x, y in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _roundtrip(state, make_fresh):
    from vaeplay_tpu.train.checkpoint import restore_state, save_state

    with tempfile.TemporaryDirectory() as d:
        ck = Checkpointer(d)
        save_state(ck, 7, state)
        restored, tag = restore_state(d, make_fresh())
        assert tag == 7
        _assert_states_equal(state, restored)


def test_save_restore_trainstate_without_batch_stats():
    """BP-style state (batch_stats=None) survives the uniform helpers."""
    _roundtrip(_toy_train_state(3.0, with_bn=False),
               lambda: _toy_train_state(0.0, with_bn=False))


def test_save_restore_gan_state():
    """GanState (BE_GAN/BCP): both nets' params AND optimizer states resume
    (round-1 gap: cli/train_be_gan dropped opt_state)."""
    from vaeplay_tpu.train.steps_be_gan import GanState

    def make(seed):
        return GanState(g=_toy_train_state(seed), d=_toy_train_state(seed + 1, with_bn=False))

    # advance the G optimizer once so opt_state is nontrivial
    gs = make(1.0)
    grads = jax.tree_util.tree_map(jnp.ones_like, gs.g.params)
    gs = gs.replace(g=gs.g.apply_gradients(grads))
    _roundtrip(gs, lambda: make(0.0))


def test_save_restore_font_state():
    """FontState incl. the style-only multi_transform optimizer state."""
    from vaeplay_tpu.train.steps_be_font import FontState, style_only_tx

    def make(seed):
        g = _toy_train_state(seed)
        sp = {"style_encoder": {"w": jnp.full((2,), seed)},
              "other": {"w": jnp.full((2,), seed)}}
        s_tx = style_only_tx(1e-3)
        g = g.replace(params=sp, opt_state=g.tx.init(sp))
        return FontState(g=g, style_opt_state=s_tx.init(sp),
                         d=_toy_train_state(seed + 2))

    _roundtrip(make(5.0), lambda: make(0.0))


def test_save_restore_style_gan_state():
    """StyleGanState: three nets resume together."""
    from vaeplay_tpu.train.steps_style_gan import StyleGanState

    def make(seed):
        return StyleGanState(e=_toy_train_state(seed, with_bn=False),
                             g=_toy_train_state(seed + 1, with_bn=False),
                             d=_toy_train_state(seed + 2, with_bn=False))

    _roundtrip(make(2.0), lambda: make(0.0))


def test_restore_migrates_dual_tower_bcp_checkpoint():
    """Pre-round-3 BCP checkpoints store the ContentEndoer as dual a{i}/b{i}
    TMPBlock towers; the shipped model uses the merged m{i} layout.  Resume
    must migrate params AND optimizer moments (ADVICE.md round 3, medium)."""
    from vaeplay_tpu.models.bcp import ContentEndoer
    from vaeplay_tpu.train.checkpoint import restore_state, save_state
    from vaeplay_tpu.train.state import torch_adam

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 1)),
                    jnp.float32)

    dual = ContentEndoer(blocks=2, merged=False)
    dv = jit_init(dual, {"params": jax.random.PRNGKey(0)}, x)
    dstate = TrainState.create(dual.apply, dv["params"], None, torch_adam(1e-3))
    # advance once so Adam moments are nontrivial and must be migrated too
    grads = jax.tree_util.tree_map(jnp.ones_like, dstate.params)
    dstate = dstate.apply_gradients(grads)

    merged = ContentEndoer(blocks=2, merged=True)
    mv = jit_init(merged, {"params": jax.random.PRNGKey(1)}, x)

    with tempfile.TemporaryDirectory() as d:
        save_state(Checkpointer(d), 4, dstate)
        fresh = TrainState.create(merged.apply, mv["params"], None,
                                  torch_adam(1e-3))
        restored, tag = restore_state(d, fresh)
        assert tag == 4

    out_dual = dual.apply({"params": dstate.params}, x, train=False)
    out_merged = merged.apply({"params": restored.params}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_merged), np.asarray(out_dual),
                               atol=2e-5, rtol=2e-5)

    # the Adam moments followed the same repack: step count and a moved leaf
    assert int(restored.step) == int(dstate.step)
    from flax import serialization
    ro = serialization.to_state_dict(restored)["opt_state"]
    do = serialization.to_state_dict(dstate)["opt_state"]
    flat_r = jax.tree_util.tree_flatten(ro)[0]
    flat_d = jax.tree_util.tree_flatten(do)[0]
    assert sum(np.asarray(x).size for x in flat_r) == sum(
        np.asarray(x).size for x in flat_d)


def test_restore_layout_mismatch_raises_clear_error():
    """A template mismatch with no known migration must name the converter
    instead of dying in orbax internals."""
    import pytest

    from vaeplay_tpu.train.checkpoint import restore_state, save_state

    with tempfile.TemporaryDirectory() as d:
        save_state(Checkpointer(d), 1, _toy_train_state(1.0, with_bn=False))
        other = _toy_train_state(0.0, with_bn=False)
        other = other.replace(params={"different": {"w": jnp.zeros((2,))}},
                              opt_state=other.tx.init(
                                  {"different": {"w": jnp.zeros((2,))}}))
        with pytest.raises(ValueError, match="migration"):
            restore_state(d, other)
