"""bf16 mixed-precision parity budget: loss trajectories of the bf16 compute
policy (utils/amp.py — master params/opt/BN stats/losses f32) must track the
f32 trajectories within tolerance over several steps (SURVEY.md §7 bullet d).
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow  # heavy full-model run; fast-tier budget (round-5 VERDICT item 6)
def test_vae_bf16_trajectory_tracks_f32():
    from vaeplay_tpu.data.circles import CircleDataset
    from vaeplay_tpu.models.vae_gan import VaeGan
    from vaeplay_tpu.train.state import TrainState, grouped_transform, torch_rmsprop
    from vaeplay_tpu.train.steps_vae import make_circle_train_step

    img = 64
    model = VaeGan(img_size=img, z_size=32)
    x = jnp.zeros((2, img, img, 1))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(1)}, x)
    tx = grouped_transform(
        {k: torch_rmsprop(1e-4) for k in
         ("encoder", "decoder", "discriminator", "param_encoder")},
        v["params"])
    ds = CircleDataset(n=img, min_radius=8, data_size=32, seed=5)

    def run(dtype):
        state = TrainState.create(model.apply, v["params"], v["batch_stats"], tx)
        step = make_circle_train_step(model, img, compute_dtype=dtype)
        out = []
        for i, pb in enumerate(ds.epoch_batches(4)):
            if i == 4:
                break
            state, m = step(state, jnp.asarray(pb), jax.random.PRNGKey(i))
            out.append({k: float(val) for k, val in m.items()})
        # every state leaf must stay f32 (master precision)
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32
        return out

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    # Step 1 runs from IDENTICAL states, so any metric difference is pure
    # bf16 rounding: every loss must agree to 5% relative (recon to 0.05 abs).
    assert abs(bf16[0]["loss_recon"] - f32[0]["loss_recon"]) < 0.05
    for k in f32[0]:
        rel = abs(bf16[0][k] - f32[0][k]) / (abs(f32[0][k]) + 1e-6)
        assert rel < 0.05, (k, bf16[0][k], f32[0][k])
    # Later steps compound tiny perturbations through RMSprop on an untrained
    # adversarial net — absolute loss magnitudes legitimately diverge (any
    # epsilon perturbation does this, not just bf16).  The trajectory budget:
    # the pixel-space recon loss must keep tracking and nothing may blow up.
    for s32, s16 in zip(f32, bf16):
        assert abs(s16["loss_recon"] - s32["loss_recon"]) < 0.1, (s16, s32)
        for k, val in s16.items():
            assert np.isfinite(val), (k, val)


def test_merge_batch_stats_preserves_sub_ulp_increments():
    """The f32-master BN-stats accumulation: EMA increments far below the
    bf16 ulp must survive repeated steps instead of being requantized away."""
    from vaeplay_tpu.utils.amp import merge_batch_stats

    # flax BatchNorm computes the EMA update in f32 even when the stored
    # running value was cast to bf16 for the forward (batch stats are f32,
    # promotion lifts the whole expression) — so `mut` carries the increment
    # at f32 precision relative to the bf16-rounded running value.
    momentum = 0.999  # increment per step = 1e-3 * (batch - running)
    master = jnp.asarray([1.0], jnp.float32)
    target = jnp.asarray([1.01], jnp.float32)  # batch statistic, constant
    naive = master
    for _ in range(50):
        seen = master.astype(jnp.bfloat16).astype(jnp.float32)
        mut = momentum * seen + (1 - momentum) * target  # f32, like flax
        master = merge_batch_stats(master, mut, jnp.bfloat16)
        # the defective policy: requantize the running value to bf16 each step
        seen_n = naive.astype(jnp.bfloat16).astype(jnp.float32)
        naive = (momentum * seen_n + (1 - momentum) * target).astype(
            jnp.bfloat16).astype(jnp.float32)
        assert master.dtype == jnp.float32
    exact = 1.0 + (0.01) * (1 - momentum ** 50)
    # master accumulation tracks the exact f32 EMA closely (residual error
    # comes only from the bf16-rounded value the forward normalizes with)...
    assert abs(float(master[0]) - exact) < 5e-5, (float(master[0]), exact)
    # ...while bf16 requantization loses every increment (1e-5 < bf16 ulp at 1.0)
    assert float(naive[0]) == 1.0
    # f32 compute passes mutated through untouched
    passthrough = merge_batch_stats(jnp.asarray([2.0]), jnp.asarray([3.0]), None)
    assert float(passthrough[0]) == 3.0


def test_conv_block_bn_preserves_bf16_chain():
    """BatchNorm/GroupNorm must not upcast a bf16 activation chain to f32
    (flax norms return f32 by default, which would silently disable mixed
    precision for every layer downstream of the first norm)."""
    from vaeplay_tpu.core.layers import ConvBlock

    x = jnp.zeros((1, 8, 8, 3), jnp.bfloat16)
    for norm in ("batch", "instance"):
        m = ConvBlock(4, 3, bn=norm)
        v = m.init(jax.random.PRNGKey(0), x)
        v16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
        out = m.apply(v16, x, mutable=["batch_stats"])[0]
        assert out.dtype == jnp.bfloat16, norm


def test_be_bf16_step_finite_and_f32_state():
    from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
    from vaeplay_tpu.models.be import ComposeNet
    from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
    from vaeplay_tpu.train.steps_be import make_be_train_step
    from vaeplay_tpu.utils.jitting import jit_init

    img = 64
    # slim backbone: the amp POLICY (bf16 FLOPs, f32 master state) is what is
    # under test; full-depth numerics are covered by the slow tier
    model = ComposeNet(backbone_layers=(1, 1, 1, 1), backbone_width=16)
    v = jit_init(model, {"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, img, img, 3)))
    state = TrainState.create(model.apply, v["params"], v["batch_stats"],
                              frozen_backbone_adam(1e-4),
                              constants=v.get("constants"))
    b = SyntheticBubbleDataset(img_size=img).sample_batch(2)
    f32_step = make_be_train_step(model)
    bf_step = make_be_train_step(model, compute_dtype=jnp.bfloat16)
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["bimgs"]),
            jnp.asarray(b["eimgs"]))
    _, m32 = f32_step(state, *args)
    s16, m16 = bf_step(state, *args)
    for k in m32:
        assert np.isfinite(float(m16[k]))
        assert abs(float(m16[k]) - float(m32[k])) < 0.05, (k, m16[k], m32[k])
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == jnp.float32
