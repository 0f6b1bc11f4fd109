"""Training-TRAJECTORY parity gates (round-2 VERDICT missing #2).

The weight-transplant tests (test_parity_vaegan.py) pin step-0 forward/loss
values; they cannot catch optimizer-wiring bugs — which losses touch which
params, the `.detach()` cuts, grad accumulation across the reference's five
`backward(retain_graph=True)` passes (train.py:68-78) vs the rebuild's one
fused grad-of-sum.  These tests train the REFERENCE trainer step (CPU-shimmed
torch, /root/reference/train.py:40-78) and the rebuild for N steps on
identical weights, batches, and recorded noise, and assert the loss curves
track.

The matching Style_GAN gate (the highest multi-phase-rewiring-risk family)
lives in test_parity_trajectory_stylegan.py.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')

REFERENCE = "/root/reference"
IMG, Z, B, STEPS = 32, 32, 4, 20
LR = 1e-4          # train.py:137
LAMBDA_MSE = 1e-6  # train.py:15


@pytest.fixture(scope="module")
def pair(reference_torch_env):
    from models.networks import VaeGan as TorchVaeGan  # reference, read-only

    torch.manual_seed(0)
    tnet = TorchVaeGan(IMG, Z, num_of_param=3)
    tnet.train()

    from vaeplay_tpu.models.torch_convert import vaegan_from_torch
    from vaeplay_tpu.models.vae_gan import VaeGan

    # .copy(): detach().numpy() SHARES memory with the live torch params
    # (and the converter's np.transpose makes views) — without a copy the
    # reference optimizer steps would mutate the transplanted jax weights
    # before the first jit call materializes them
    sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    params, stats = vaegan_from_torch(sd, IMG)
    jnet = VaeGan(img_size=IMG, z_size=Z)
    return tnet, jnet, params, stats


def _torch_reference_step(tnet, opts, imgs, targets, eps, z_p,
                          return_grads=False):
    """One EXACT reference train iteration (train.py:40-78): forward with the
    recorded noise, the five retained backwards, the four RMSprop steps.
    Returns the reference's logged loss scalars; with return_grads, also the
    accumulated .grad of one representative tensor per optimizer group
    (opts may be None then to skip the parameter update)."""
    import torch.nn.functional as F

    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
    ttargets = torch.from_numpy(targets.copy())
    teps = torch.from_numpy(eps.copy())
    tz_p = torch.from_numpy(z_p.copy())
    bs = timgs.size(0)

    # recorded-noise injection: reparameterize eps (networks.py:228-231) and
    # the prior draw (networks.py:241).  The instance attribute shadows the
    # method; torch.randn is called exactly once inside the training forward.
    tnet.reparameterize = lambda mu, logvar: mu + teps * logvar.mul(0.5).exp()
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: tz_p.clone()
    try:
        x_tilde, disc_class, disc_layer, mus, log_variances, params = tnet(timgs)
    finally:
        torch.randn = orig_randn
        del tnet.reparameterize

    from models.networks import VaeGan as TorchVaeGan

    dl_o, dl_p = disc_layer[:bs], disc_layer[bs:-bs]
    dl_s = disc_layer[-bs:]
    dc_o, dc_p, dc_s = (disc_class[:bs], disc_class[bs:-bs], disc_class[-bs:])
    nle, kl, mse, bce_o, bce_p, bce_s, l1_param = TorchVaeGan.loss(
        timgs, x_tilde, dl_o, dl_p, dl_s, dc_o, dc_p, dc_s,
        mus, log_variances, ttargets, params)

    loss_recon = F.mse_loss(timgs, x_tilde)
    loss_encoder = torch.sum(kl) + torch.sum(mse)
    loss_discriminator = torch.sum(bce_o) + torch.sum(bce_p) + torch.sum(bce_s)
    loss_decoder = (torch.sum(LAMBDA_MSE * mse)
                    - (1.0 - LAMBDA_MSE) * loss_discriminator)
    loss_aux = l1_param

    tnet.zero_grad()
    loss_recon.backward(retain_graph=True)
    loss_encoder.backward(retain_graph=True)
    loss_decoder.backward(retain_graph=True)
    loss_discriminator.backward(retain_graph=True)
    loss_aux.backward()
    grads = None
    if return_grads:
        grads = {
            "encoder": tnet.encoder.conv[0].conv.weight.grad.numpy().copy(),
            "decoder": tnet.decoder.conv[0].conv.weight.grad.numpy().copy(),
            "discriminator":
                tnet.discriminator.conv[1].conv.weight.grad.numpy().copy(),
            "param_encoder":
                tnet.param_encoder.head[0].weight.grad.numpy().copy(),
        }
    if opts is not None:
        for o in opts:
            o.step()
    metrics = {
        "loss_recon": float(loss_recon),
        "loss_encoder": float(loss_encoder),
        "loss_discriminator": float(loss_discriminator),
        "loss_decoder": float(loss_decoder),
        "loss_aux": float(loss_aux),
        "kl": float(torch.sum(kl)),
    }
    return (metrics, grads) if return_grads else metrics


def test_vaegan_training_trajectory(pair):
    """20 reference steps vs 20 fused rebuild steps from transplanted weights
    with identical batches/noise: recon-MSE and KL curves must track (the
    BASELINE.md north-star parity metric)."""
    tnet, jnet, params, stats = pair
    from vaeplay_tpu.train.state import (
        TrainState, grouped_transform, torch_rmsprop)
    from vaeplay_tpu.train.steps_vae import vae_gan_losses

    opts = [torch.optim.RMSprop(m.parameters(), lr=LR) for m in
            (tnet.encoder, tnet.decoder, tnet.discriminator,
             tnet.param_encoder)]  # train.py:137-146

    tx = grouped_transform(
        {k: torch_rmsprop(LR) for k in
         ("encoder", "decoder", "discriminator", "param_encoder")},
        params,
    )
    state = TrainState.create(jnet.apply, params, stats, tx)

    @jax.jit
    def jstep(state, imgs, targets, eps, z_p):
        def loss_fn(p, bs):
            outs, mut = jnet.apply(
                {"params": p, "batch_stats": bs}, imgs, train=True,
                noise=(eps, z_p), mutable=["batch_stats"])
            m = vae_gan_losses(outs, imgs, targets)
            total = (m["loss_recon"] + m["loss_encoder"] + m["loss_decoder"]
                     + m["loss_discriminator"] + m["loss_aux"])
            return total, (m, mut["batch_stats"])

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats)
        return state.apply_gradients(grads, new_batch_stats=new_bs), metrics

    # ---- exact optimizer-WIRING gate, in FLOAT64 on both sides: the fused
    # grad-of-sum must equal the reference's accumulated .grad from the five
    # retained backwards, per optimizer group.  f64 is essential: in f32 the
    # weight-grad of a BN'd conv is a catastrophic-cancellation pattern and
    # torch's own f32 grads sit ~9%-of-scale from the f64 truth (measured) —
    # in f64 any surviving difference is a real wiring bug, so the gate can
    # be tight.  This is what catches detach-cut / loss-routing errors
    # outright, deterministically, with no trajectory chaos.
    rng = np.random.default_rng(7)
    imgs0 = rng.uniform(size=(B, IMG, IMG, 1)).astype(np.float64)
    targets0 = (rng.normal(size=(B, 3)) * 0.5).astype(np.float64)
    eps0 = rng.normal(size=(B, Z)).astype(np.float64)
    z_p0 = rng.normal(size=(B, Z)).astype(np.float64)

    sd64 = {k: torch.from_numpy(v).double()
            for k, v in ((kk, vv.detach().numpy().copy())
                         for kk, vv in tnet.state_dict().items())}
    from models.networks import VaeGan as TorchVaeGan
    tnet64 = TorchVaeGan(IMG, Z, num_of_param=3).double()
    tnet64.load_state_dict(sd64)
    tnet64.train()
    _, tgrads = _torch_reference_step(
        tnet64, None, imgs0, targets0, eps0, z_p0, return_grads=True)

    def jax_loss(p, bs, imgs, targets, eps, z_p):
        outs, _ = jnet.apply({"params": p, "batch_stats": bs}, imgs,
                             train=True, noise=(eps, z_p),
                             mutable=["batch_stats"])
        m = vae_gan_losses(outs, imgs, targets)
        return (m["loss_recon"] + m["loss_encoder"] + m["loss_decoder"]
                + m["loss_discriminator"] + m["loss_aux"])

    to64 = lambda tree: jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree)
    with jax.enable_x64(True):
        jgrads = jax.jit(jax.grad(jax_loss))(
            to64(state.params), to64(state.batch_stats), jnp.asarray(imgs0),
            jnp.asarray(targets0), jnp.asarray(eps0), jnp.asarray(z_p0))
        jgrads = jax.device_get(jgrads)
    for group, got, want in (
        ("encoder", jgrads["encoder"]["block0"]["conv"]["kernel"],
         np.transpose(tgrads["encoder"], (2, 3, 1, 0))),
        ("decoder", jgrads["decoder"]["block0"]["conv"]["kernel"],
         np.transpose(tgrads["decoder"], (2, 3, 0, 1))),
        ("discriminator", jgrads["discriminator"]["block1"]["conv"]["kernel"],
         np.transpose(tgrads["discriminator"], (2, 3, 1, 0))),
        ("param_encoder", jgrads["param_encoder"]["head0"]["kernel"],
         np.transpose(tgrads["param_encoder"], (1, 0))),
    ):
        scale = max(np.abs(want).max(), 1e-12)
        np.testing.assert_allclose(
            np.asarray(got) / scale, want / scale, rtol=0, atol=1e-9,
            err_msg=f"{group} gradient wiring mismatch")

    # ---- trajectory gate.  A bitwise-matched 20-step trajectory is not
    # achievable in f32: RMSprop's first steps normalize every gradient to
    # ~±lr (sq starts at 0), so op-order noise on near-zero grads flips
    # update SIGNS and the runs separate chaotically.  What must hold is:
    # tight agreement over the first steps, and statistical tracking of the
    # whole curve.
    t_curve = {k: [] for k in ("loss_recon", "kl", "loss_aux",
                               "loss_discriminator")}
    j_curve = {k: [] for k in t_curve}
    for _ in range(STEPS):
        imgs = rng.uniform(size=(B, IMG, IMG, 1)).astype(np.float32)
        targets = rng.normal(size=(B, 3)).astype(np.float32) * 0.5
        eps = rng.normal(size=(B, Z)).astype(np.float32)
        z_p = rng.normal(size=(B, Z)).astype(np.float32)

        tm = _torch_reference_step(tnet, opts, imgs, targets, eps, z_p)
        state, jm = jstep(state, jnp.asarray(imgs), jnp.asarray(targets),
                          jnp.asarray(eps), jnp.asarray(z_p))
        for k in t_curve:
            t_curve[k].append(tm[k])
            j_curve[k].append(float(jm[k]))

    # calibration note: with the wiring PROVEN exact above, the measured f32
    # chaos growth is ~0.1% at step 1 and up to ~10% by step 5 (sign flips of
    # RMSprop-normalized near-zero grads compound ~3x/step); the gates below
    # sit just outside that envelope and far inside wiring-bug scale (a
    # missing loss term or detach cut shifts curves by O(50-100%)).
    for k in t_curve:
        t, j = np.asarray(t_curve[k]), np.asarray(j_curve[k])
        np.testing.assert_allclose(
            j[:3], t[:3], rtol=3e-2, atol=3e-2,
            err_msg=f"{k} diverged within 3 steps (wiring-scale error):\n"
                    f"ref={t_curve[k]}\ngot={j_curve[k]}")
        rel = np.abs(j - t) / np.maximum(np.abs(t), 1e-3)
        mean_shift = abs(j.mean() - t.mean()) / max(abs(t.mean()), 1e-3)
        assert rel.mean() < 0.12 and mean_shift < 0.06, (
            f"{k} curve does not track: mean rel {rel.mean():.4f}, "
            f"window-mean shift {mean_shift:.4f}\nref={t_curve[k]}\n"
            f"got={j_curve[k]}")

    # the curves must also reflect actual LEARNING, not a frozen model: the
    # aux head is supervised and must improve over the window
    assert j_curve["loss_aux"][-1] < j_curve["loss_aux"][0]
