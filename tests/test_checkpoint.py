"""Checkpoint save/restore round-trip fidelity."""

import os
import tempfile

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
