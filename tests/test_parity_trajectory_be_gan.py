"""BE_GAN training-trajectory parity gate (round-4 VERDICT item 1).

BE_GAN's riskiest rewiring is the feature-matching adversarial step
(train_BE_GAN.py:131-165): a D phase driving `1 − mean|f_fake − f_real|` +
type CE through two MaskMappers, then a G phase against the UPDATED D with
mask/edge BCE+dice ×2 + feature matching + type CE + 0.5×Laplacian edge
loss.  The rebuild fuses each phase into one jit program
(train/steps_be_gan.py) with the s2d small-channel conv rewrites
(SmallChannelConv3x3S1/S2) in the heads and D stem; until now that wiring
was only self-tested.

The reference builds its backbone via torchvision's
`resnet_fpn_backbone('resnet50', True)` (networks_BE_GAN.py:44) — absent in
this environment, so the gate installs tests/torch_fpn_shim.py (a minimal
torch resnet50-FPN with torchvision semantics + state-dict layout) and
transplants its weights through backbone.convert_torchvision_state_dict,
which also exercises the real torchvision-checkpoint conversion path.

Gates:
  1. step-0 forward parity from transplanted weights (G logits, D type
     logits, and the scalar feature-matching distance — the per-element
     feature layouts differ NCHW/NHWC but the matching loss is
     permutation-invariant);
  2. frozen-backbone check: conv1/layer1 receive no update on either side
     (torchvision trainable_layers=3);
  3. 8-step loss-curve tracking of the full D+G iteration — all 7 logged
     losses (train_BE_GAN.py:86-96).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # excluded from the fast tier

IMG, B, STEPS = 128, 2, 8
LR = 1e-4  # train_BE_GAN.py:236-237: G Adam(lr, (0.5,0.999)), D Adam(lr*0.1)


@pytest.fixture(scope="module")
def be_gan_pair(reference_torch_env):
    from tests import torch_fpn_shim

    torch_fpn_shim.install(reference_torch_env)

    import models.networks_BE_GAN as ref  # reference, read-only
    import tools.ops as ref_ops

    torch.manual_seed(0)
    tg = ref.ComposeNet(3, IMG)
    td = ref.Discriminator(3, IMG, 4)
    ref_ops.initialize_model(tg.aux_convs)   # train_BE_GAN.py:226-229
    ref_ops.initialize_model(tg.mask_net)
    ref_ops.initialize_model(tg.edge_net)
    ref_ops.initialize_model(td)
    tg.train()
    td.train()

    from vaeplay_tpu.models.be_gan import ComposeNet, Discriminator
    from vaeplay_tpu.models.torch_convert import (
        be_gan_disc_from_torch, be_gan_from_torch)
    from vaeplay_tpu.utils.jitting import jit_init

    jg = ComposeNet()
    jd = Discriminator(in_size=IMG, num_classes=4)
    x = jnp.zeros((1, IMG, IMG, 3))
    m = jnp.zeros((1, IMG, IMG, 1))
    gv = jit_init(jg, {"params": jax.random.PRNGKey(0)}, x)
    g_sd = {k: v.detach().numpy().copy() for k, v in tg.state_dict().items()}
    d_sd = {k: v.detach().numpy().copy() for k, v in td.state_dict().items()}
    g_params, g_stats, g_consts = be_gan_from_torch(g_sd, gv)
    d_params, d_stats = be_gan_disc_from_torch(d_sd)
    return tg, td, jg, jd, (g_params, g_stats, g_consts), (d_params, d_stats)


def _batch(rng):
    imgs = rng.uniform(size=(B, IMG, IMG, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:IMG, 0:IMG]
    bimgs = np.zeros((B, IMG, IMG, 1), np.float32)
    eimgs = np.zeros((B, IMG, IMG, 1), np.float32)
    for i in range(B):
        cy, cx = rng.integers(IMG // 4, 3 * IMG // 4, 2)
        r = rng.integers(IMG // 8, IMG // 4)
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        bimgs[i, :, :, 0] = (d2 <= r * r).astype(np.float32)
        ring = (d2 <= r * r) & (d2 >= (r - 3) ** 2)
        eimgs[i, :, :, 0] = ring.astype(np.float32)
    labels = rng.integers(0, 4, (B,))
    return imgs, bimgs, eimgs, labels


def _to_torch(imgs, bimgs, eimgs, labels):
    t = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2).copy())
    return t(imgs), t(bimgs), t(eimgs), torch.from_numpy(labels).long()


def test_transplant_forward_parity(be_gan_pair):
    tg, td, jg, jd, (g_params, g_stats, g_consts), (d_params, d_stats) = be_gan_pair
    rng = np.random.default_rng(7)
    imgs, bimgs, eimgs, labels = _batch(rng)
    timgs, tbi, tei, tlab = _to_torch(imgs, bimgs, eimgs, labels)

    tg.eval()
    td.eval()
    with torch.no_grad():
        tpred = tg(timgs)
        t_real_type, t_real_feats = td(timgs, tbi, tei)
        t_fake_type, t_fake_feats = td(timgs, tpred["masks"].sigmoid(),
                                       tpred["edges"].sigmoid())
        t_match = float(torch.mean(torch.abs(t_fake_feats - t_real_feats)))
    tg.train()
    td.train()

    jpred = jg.apply({"params": g_params, "batch_stats": g_stats,
                      "constants": g_consts}, jnp.asarray(imgs), train=False)
    np.testing.assert_allclose(
        np.asarray(jpred["masks"])[..., 0],
        tpred["masks"].numpy()[:, 0], atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(jpred["edges"])[..., 0],
        tpred["edges"].numpy()[:, 0], atol=2e-3, rtol=1e-2)

    jm = jax.nn.sigmoid(jpred["masks"])
    je = jax.nn.sigmoid(jpred["edges"])
    (j_real_type, j_real_feats) = jd.apply(
        {"params": d_params, "batch_stats": d_stats}, jnp.asarray(imgs),
        jnp.asarray(bimgs), jnp.asarray(eimgs), train=False)
    (j_fake_type, j_fake_feats) = jd.apply(
        {"params": d_params, "batch_stats": d_stats}, jnp.asarray(imgs),
        jm, je, train=False)
    np.testing.assert_allclose(np.asarray(j_real_type), t_real_type.numpy(),
                               atol=2e-3, rtol=1e-2)
    j_match = float(jnp.mean(jnp.abs(j_fake_feats - j_real_feats)))
    # feature layouts differ (NCHW vs NHWC flattening) but the matching
    # distance is a mean over the same multiset of |Δ| values
    np.testing.assert_allclose(j_match, t_match, atol=1e-4, rtol=1e-3)


def test_be_gan_training_trajectory(be_gan_pair):
    """8 reference D+G iterations vs 8 fused rebuild steps from transplanted
    weights on identical batches: all 7 logged losses track, and the frozen
    backbone stem stays fixed on both sides."""
    import torch.nn.functional as F
    import tools.ops as ref_ops

    tg, td, jg, jd, (g_params, g_stats, g_consts), (d_params, d_stats) = be_gan_pair
    from vaeplay_tpu.train.state import (
        TrainState, frozen_backbone_adam, torch_adam)
    from vaeplay_tpu.train.steps_be_gan import GanState, make_be_gan_train_step

    g_opt = torch.optim.Adam(tg.parameters(), lr=LR, betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(td.parameters(), lr=LR * 0.1, betas=(0.5, 0.999))

    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    gs = GanState(
        g=TrainState.create(jg.apply, to_j(g_params), to_j(g_stats),
                            frozen_backbone_adam(LR, (0.5, 0.999)),
                            constants=to_j(g_consts)),
        d=TrainState.create(jd.apply, to_j(d_params), to_j(d_stats),
                            torch_adam(LR * 0.1, (0.5, 0.999))),
    )
    jstep = make_be_gan_train_step(jg, jd)

    stem0_t = next(tg.backbone.body.conv1.parameters()).detach().numpy().copy()
    stem0_j = np.asarray(gs.g.params["backbone"]["body"]["conv1"]["kernel"])

    keys = ("d_adv_loss", "d_type_loss", "loss_mask", "loss_edge",
            "g_adv_loss", "g_type_loss", "loss_cnt")
    t_curve = {k: [] for k in keys}
    j_curve = {k: [] for k in keys}
    rng = np.random.default_rng(11)
    for _ in range(STEPS):
        imgs, bimgs, eimgs, labels = _batch(rng)
        timgs, tbi, tei, tlab = _to_torch(imgs, bimgs, eimgs, labels)

        # --- reference D phase (train_BE_GAN.py:130-145)
        with torch.no_grad():
            preds = tg(timgs)
            pred_masks = preds["masks"].sigmoid()
            pred_edges = preds["edges"].sigmoid()
        d_real_type, d_real_feats = td(timgs, tbi, tei)
        d_fake_type, d_fake_feats = td(timgs, pred_masks, pred_edges)
        d_adv = 1 - torch.mean(torch.abs(d_fake_feats - d_real_feats))
        d_type = F.cross_entropy(d_real_type, tlab)
        d_opt.zero_grad(set_to_none=False)
        (d_adv + d_type).backward()
        d_opt.step()

        # --- reference G phase (train_BE_GAN.py:147-165)
        preds = tg(timgs)
        pm, pe = preds["masks"], preds["edges"]
        with torch.no_grad():
            _, g_real_feats = td(timgs, tbi, tei)
        g_pred_type, g_pred_feats = td(timgs, pm.sigmoid(), pe.sigmoid())
        loss_mask = (0.5 * F.binary_cross_entropy_with_logits(pm, tbi)
                     + ref_ops.compute_dice_loss(pm.sigmoid(), tbi))
        loss_edge = (0.5 * F.binary_cross_entropy_with_logits(pe, tei)
                     + ref_ops.compute_dice_loss(pe.sigmoid(), tei))
        g_adv = torch.mean(torch.abs(g_pred_feats - g_real_feats))
        g_type = F.cross_entropy(g_pred_type, tlab)
        loss_cnt = (ref_ops.edge_loss(pm.sigmoid(), tbi)
                    + ref_ops.edge_loss(pe.sigmoid(), tei))
        g_opt.zero_grad(set_to_none=False)
        (loss_mask * 2 + loss_edge * 2 + g_adv + g_type + loss_cnt * 0.5).backward()
        g_opt.step()
        tm = {"d_adv_loss": float(d_adv), "d_type_loss": float(d_type),
              "loss_mask": float(loss_mask), "loss_edge": float(loss_edge),
              "g_adv_loss": float(g_adv), "g_type_loss": float(g_type),
              "loss_cnt": float(loss_cnt)}

        gs, jm = jstep(gs, jnp.asarray(imgs), jnp.asarray(bimgs),
                       jnp.asarray(eimgs), jnp.asarray(labels))
        for k in keys:
            t_curve[k].append(tm[k])
            j_curve[k].append(float(jm[k]))

    # frozen stem (torchvision trainable_layers=3) unchanged on both sides
    np.testing.assert_array_equal(
        next(tg.backbone.body.conv1.parameters()).detach().numpy(), stem0_t)
    np.testing.assert_array_equal(
        np.asarray(gs.g.params["backbone"]["body"]["conv1"]["kernel"]), stem0_j)

    for k in keys:
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
