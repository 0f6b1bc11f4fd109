"""Style_GAN training-trajectory parity gate (round-2 VERDICT missing #2).

Style_GAN is the highest multi-phase-rewiring-risk family: the reference's
E/G phase (train_Style_GAN.py:210-238) does `g_loss.backward(retain_graph)`,
steps the ENCODER, then evaluates the latent-cycle loss with the UPDATED
encoder and lets its gradient ACCUMULATE onto G's existing grads before the
G step; the rebuild re-derives this as one fused program with a shared jax.vjp
linearization of the x_gen branch (train/steps_style_gan.py).  This test
trains both from transplanted weights on identical batches and recorded
noise and asserts every logged loss curve tracks.
"""


import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')

REFERENCE = "/root/reference"
IMG, Z, B, STEPS = 32, 32, 2, 12
LR = 1e-4  # train_Style_GAN.py:337-339


@pytest.fixture(scope="module")
def nets(reference_torch_env):
    from models.network_Style_GAN import (  # reference, read-only
        Discriminator as TD, Generator as TG, StyleEncoder as TE)

    torch.manual_seed(0)
    te = TE(Z, IMG)
    tg = TG(IMG, Z)
    td = TD(IMG, 2)
    for m in (te, tg, td):
        m.train()

    from vaeplay_tpu.models.style_gan import Discriminator, Generator, StyleEncoder
    from vaeplay_tpu.models.torch_convert import (
        style_discriminator_from_torch, style_encoder_from_torch,
        style_generator_from_torch)

    def sd(m):
        # .copy(): the torch optimizer steps must not mutate the transplanted
        # jax weights through shared numpy views (see test_parity_trajectory)
        return {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}

    e_params = style_encoder_from_torch(sd(te), IMG)
    g_params = style_generator_from_torch(sd(tg))
    d_params = style_discriminator_from_torch(sd(td), IMG)
    je = StyleEncoder(z_dim=Z, image_size=IMG)
    jg = Generator(image_size=IMG, z_dim=Z)
    jd = Discriminator(image_size=IMG, num_classes=2)
    return (te, tg, td), (je, jg, jd), (e_params, g_params, d_params)


def test_transplant_forward_parity(nets):
    """Step-0 sanity for the converters: E moments, G output, D heads."""
    (te, tg, td), (je, jg, jd), (ep, gp, dp) = nets
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(B, IMG, IMG, 3)).astype(np.float32)
    xc = rng.uniform(0, 1, size=(B, IMG, IMG, 3)).astype(np.float32)
    z = rng.normal(size=(B, Z)).astype(np.float32)
    y = np.array([0, 1], dtype=np.int64)[:B]

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    txc = torch.from_numpy(xc.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        tmu, tlv = te(tx)
        tgen = tg(txc, torch.from_numpy(z), torch.from_numpy(y))
        tadv, taux = td(tx, txc, torch.from_numpy(y))

    jmu, jlv = je.apply({"params": ep}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(jmu), tmu.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(jlv), tlv.numpy(), atol=3e-4)
    jgen = jg.apply({"params": gp}, jnp.asarray(xc), jnp.asarray(z),
                    jnp.asarray(y), train=False)
    np.testing.assert_allclose(
        np.asarray(jgen), tgen.numpy().transpose(0, 2, 3, 1), atol=3e-4)
    jadv, jaux = jd.apply({"params": dp}, jnp.asarray(x), jnp.asarray(xc),
                          train=False)
    np.testing.assert_allclose(np.asarray(jadv), tadv.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(jaux), taux.numpy(), atol=3e-4)


def _torch_reference_step(te, tg, td, opts, x_target, x_content, labels,
                          eps, z_sample):
    """One EXACT reference train_random_gan iteration
    (train_Style_GAN.py:210-260) with recorded noise."""
    import torch.nn.functional as F

    e_opt, g_opt, d_opt = opts
    xt = torch.from_numpy(x_target.transpose(0, 3, 1, 2).copy())
    xc = torch.from_numpy(x_content.transpose(0, 3, 1, 2).copy())
    y = torch.from_numpy(labels.copy())
    teps = torch.from_numpy(eps.copy())
    tz = torch.from_numpy(z_sample.copy())
    b = xt.size(0)

    e_opt.zero_grad()
    g_opt.zero_grad()
    mu, logvar = te(xt)
    encode_z = teps * torch.exp(logvar / 2) + mu  # :156-160, recorded eps
    x_rec = tg(xc, encode_z, y)
    d_rec_valid, d_rec_type = td(x_rec, xc, y)
    g_rec_kl = 0.5 * torch.sum(torch.exp(logvar) + mu ** 2 - logvar - 1)
    g_rec_d = (F.binary_cross_entropy(d_rec_valid, torch.ones((b, 1)))
               + F.cross_entropy(d_rec_type, y))
    g_rec_pixel = F.l1_loss(x_rec, xt)
    g_rec_loss = g_rec_pixel + g_rec_d + g_rec_kl

    x_gen = tg(xc, tz, y)  # :223-224, recorded prior sample
    d_gen_valid, d_gen_type = td(x_gen, xc, y)
    g_gen_d = (F.binary_cross_entropy(d_gen_valid, torch.ones((b, 1)))
               + F.cross_entropy(d_gen_type, y))
    g_loss = g_rec_loss + g_gen_d

    g_loss.backward(retain_graph=True)
    e_opt.step()                       # :231-232

    _mu, _ = te(x_gen)                 # UPDATED encoder (:234)
    loss_latent = F.l1_loss(_mu, tz) * 0.5
    loss_latent.backward()             # accumulates onto G's grads
    g_opt.step()                       # :238

    d_opt.zero_grad()                  # :243
    d_real_valid, d_real_type = td(xt, xc, y)
    d_fake_valid, d_fake_type = td(x_rec.detach(), xc, y)
    d_real = (F.binary_cross_entropy(d_real_valid, torch.ones((b, 1)))
              + F.cross_entropy(d_real_type, y))
    d_fake = (F.binary_cross_entropy(d_fake_valid, torch.zeros((b, 1)))
              + F.cross_entropy(d_fake_type, y))
    ((d_real + d_fake) * 0.5).backward()
    d_opt.step()
    return {
        "g_rec_kl_loss": float(g_rec_kl),
        "g_rec_d_loss": float(g_rec_d),
        "g_rec_pixel_loss": float(g_rec_pixel),
        "g_gen_d_loss": float(g_gen_d),
        "loss_latent": float(loss_latent),
        "d_real_loss": float(d_real),
        "d_fake_loss": float(d_fake),
    }


def test_stylegan_training_trajectory(nets):
    (te, tg, td), (je, jg, jd), (ep, gp, dp) = nets
    from vaeplay_tpu.train.state import TrainState, torch_adam
    from vaeplay_tpu.train.steps_style_gan import (
        StyleGanState, make_style_gan_train_step)

    opts = [torch.optim.Adam(m.parameters(), lr=LR) for m in (te, tg, td)]
    ss = StyleGanState(
        e=TrainState.create(je.apply, ep, None, torch_adam(LR)),
        g=TrainState.create(jg.apply, gp, None, torch_adam(LR)),
        d=TrainState.create(jd.apply, dp, None, torch_adam(LR)),
    )
    jstep = make_style_gan_train_step(je, jg, jd, z_dim=Z,
                                      recorded_noise=True)

    rng = np.random.default_rng(11)
    keys = ("g_rec_kl_loss", "g_rec_d_loss", "g_rec_pixel_loss",
            "g_gen_d_loss", "loss_latent", "d_real_loss", "d_fake_loss")
    t_curve = {k: [] for k in keys}
    j_curve = {k: [] for k in keys}
    for _ in range(STEPS):
        x_target = rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
        x_content = rng.uniform(0, 1, (B, IMG, IMG, 3)).astype(np.float32)
        labels = rng.integers(0, 2, (B,)).astype(np.int64)
        eps = rng.normal(size=(B, Z)).astype(np.float32)
        z_sample = rng.normal(size=(B, Z)).astype(np.float32)

        tm = _torch_reference_step(te, tg, td, opts, x_target, x_content,
                                   labels, eps, z_sample)
        ss, jm = jstep(ss, jnp.asarray(x_target), jnp.asarray(x_content),
                       jnp.asarray(labels.astype(np.int32)),
                       jnp.asarray(eps), jnp.asarray(z_sample))
        for k in keys:
            t_curve[k].append(tm[k])
            j_curve[k].append(float(jm[k]))

    for k in keys:
        np.testing.assert_allclose(
            np.asarray(j_curve[k]), np.asarray(t_curve[k]),
            rtol=5e-3, atol=5e-3,
            err_msg=f"{k} trajectory diverged:\nref={t_curve[k]}\n"
                    f"got={j_curve[k]}")
