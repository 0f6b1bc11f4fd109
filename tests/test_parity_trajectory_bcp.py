"""BCP training-trajectory parity gate (round-4 VERDICT item 1).

BCP's riskiest rewiring is the two-phase GAN step (train_BCP.py:69-147):
the reference runs the G forward TWICE per iteration — once under no_grad to
build the D phase's fake point sets, once with grad for the G phase — and
the rebuild (train/steps_bcp.py) linearizes G ONCE with jax.vjp and serves
both phases from the shared forward.  Until now that rewrite was only
self-tested (tests/test_bcp.py::test_shared_vjp_step_matches_two_pass);
this gate tracks it against the live torch reference.

Gates, in order of sharpness:
  1. exact-zero gradient-cut check on the `x_cls.detach()` feed into the
     LinePredictor (networks_BCP.py:296): the point losses must not reach
     the ClassPredictor on either side;
  2. step-0 forward parity from transplanted weights (ragged reference
     splits vs fixed-capacity masked outputs);
  3. 10-step loss-curve tracking of the full D+G GAN iteration — all 8
     logged losses (train_BCP.py:40-49).

Fixed capacity + mask replaces the reference's ragged repack
(networks_BCP.py:206-210): the reference's heads run only on valid rows,
the rebuild's on all P rows with masked losses — identical loss values.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # excluded from the fast tier

IMG, B, P, STEPS = 64, 2, 64, 10
LR = 1e-3  # train_BCP.py:230-231 (lr == lr_disc)
W = 10.0   # VALUE_WEIGHT, networks_BCP.py:16


def _stub_vision_deps():
    import sys

    for name in ("cv2", "rdp"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = sk.measure
    if "torchvision" not in sys.modules:
        # networks_BCP imports resnet18/34 but never calls them (the
        # cls_classifier resnet branch is commented out, networks_BCP.py:260-263);
        # tools/utils.py imports transforms.functional but the gate never
        # touches those paths
        tv = types.ModuleType("torchvision")
        models_m = types.ModuleType("torchvision.models")
        resnet_m = types.ModuleType("torchvision.models.resnet")
        tf_m = types.ModuleType("torchvision.transforms")
        tff_m = types.ModuleType("torchvision.transforms.functional")
        resnet_m.resnet18 = lambda *a, **k: None
        resnet_m.resnet34 = lambda *a, **k: None
        tv.models = models_m
        tv.transforms = tf_m
        tf_m.functional = tff_m
        models_m.resnet = resnet_m
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models_m
        sys.modules["torchvision.models.resnet"] = resnet_m
        sys.modules["torchvision.transforms"] = tf_m
        sys.modules["torchvision.transforms.functional"] = tff_m


@pytest.fixture(scope="module")
def bcp_pair(reference_torch_env):
    _stub_vision_deps()

    import models.networks_BCP as ref_bcp  # reference, read-only
    import tools.ops as ref_ops

    torch.manual_seed(0)
    tnet = ref_bcp.ComposeNet(IMG, pt_size=P)
    tdisc = ref_bcp.Discriminator(IMG, pt_size=P)
    ref_ops.initialize_model(tnet)   # train_BCP.py:225-226
    ref_ops.initialize_model(tdisc)
    tnet.train()
    tdisc.train()

    from vaeplay_tpu.models.bcp import ComposeNet, Discriminator
    from vaeplay_tpu.models.torch_convert import (
        bcp_disc_from_torch, bcp_from_torch)

    g_sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    d_sd = {k: v.detach().numpy().copy() for k, v in tdisc.state_dict().items()}
    g_params = bcp_from_torch(g_sd)
    d_params = bcp_disc_from_torch(d_sd, IMG)
    jnet = ComposeNet(image_size=IMG, pt_size=P)
    jdisc = Discriminator(image_size=IMG, pt_size=P)
    return tnet, tdisc, jnet, jdisc, g_params, d_params


def _batch(rng):
    imgs = rng.uniform(size=(B, IMG, IMG, 3)).astype(np.float32)
    labels = rng.integers(0, 2, (B,))
    counts = np.array([P - 16, P], np.int32)
    points = np.zeros((B, P, 6), np.float32)
    for i in range(B):
        n = counts[i]
        points[i, :n, 0:2] = rng.uniform(-0.9, 0.9, (n, 2))
        points[i, :n, 2:4] = rng.uniform(-0.5, 0.5, (n, 2))
        freq = (rng.uniform(size=n) < 0.4).astype(np.float32)
        freq[0] = 1.0   # ensure >=1 trigger
        freq[1] = 0.0   # ... and >=1 non-trigger among valid rows
        points[i, :n, 4] = freq
        key = (rng.uniform(size=n) < 0.2).astype(np.float32)
        key[0] = 1.0    # ensure >=1 key point (torch mean over empty = nan)
        points[i, :n, 5] = key
    pmask = (np.arange(P)[None, :] < counts[:, None]).astype(np.float32)
    return imgs, labels, points, pmask, counts


def _to_torch(imgs, labels, points, counts):
    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
    tlabels = torch.from_numpy(labels).long()
    anno = [{"points": torch.from_numpy(points[i, :counts[i]].copy())}
            for i in range(B)]
    return timgs, tlabels, anno


def _torch_g_losses(tnet, tdisc, timgs, tlabels, anno):
    """The reference G-phase loss graph, verbatim wiring
    (train_BCP.py:95-147)."""
    import torch.nn.functional as F

    preds = tnet(timgs, target=anno)
    pred_cnts = preds["contours"]
    pred_target_pts = preds["target_pts"]

    loss_class = F.cross_entropy(preds["classes"], tlabels)

    freq_pred = torch.cat(preds["target_frequency"], dim=0)
    freq_tgt = torch.cat([t["points"][:, 4] for t in anno], dim=0) > 0.1
    loss_f1 = F.l1_loss(freq_pred[freq_tgt],
                        torch.ones_like(freq_tgt[freq_tgt],
                                        dtype=freq_pred.dtype))
    sum_of_trig = torch.sum(freq_tgt)
    sum_of_trig = sum_of_trig if sum_of_trig != 0 else 1
    nfreq = ~freq_tgt
    loss_f0 = torch.tensor(0.0)
    if torch.sum(nfreq) != 0:
        loss_f0 = F.l1_loss(
            freq_pred[nfreq],
            torch.zeros_like(nfreq[nfreq], dtype=freq_pred.dtype),
            reduction="sum") / sum_of_trig

    pred_cat = torch.cat(pred_target_pts, dim=0)
    gt_cat = torch.cat([t["points"][:, 2:4] for t in anno], dim=0) * W
    loss_total = F.l1_loss(pred_cat, gt_cat)

    key_sel = torch.cat([t["points"][:, 5] for t in anno], dim=0) > 0.9
    loss_key = torch.abs(gt_cat[key_sel] - pred_cat[key_sel])
    loss_key = torch.mean(torch.sum(loss_key, dim=1), dim=0)

    g_targets = [torch.cat([pred_cnts[i] * W, pred_target_pts[i]], dim=1)
                 for i in range(B)]
    g_adv_pred = tdisc(timgs, g_targets)
    g_adv = F.binary_cross_entropy(g_adv_pred, torch.ones_like(g_adv_pred))

    total = (loss_class + (loss_f1 + loss_f0) * 4.0 + loss_total * 10
             + loss_key * 6 + g_adv)
    return total, {
        "loss_class": loss_class, "loss_frequency_one": loss_f1,
        "loss_frequency_zero": loss_f0, "loss_total_regress": loss_total,
        "loss_key_regress": loss_key, "g_adv_loss": g_adv,
    }


def test_cls_detach_cut_exact(bcp_pair):
    """The x_cls.detach() feed (networks_BCP.py:296): point losses must not
    reach the ClassPredictor — EXACT ZEROS both sides."""
    tnet, tdisc, jnet, jdisc, g_params, d_params = bcp_pair
    rng = np.random.default_rng(5)
    imgs, labels, points, pmask, counts = _batch(rng)
    timgs, tlabels, anno = _to_torch(imgs, labels, points, counts)

    tnet.zero_grad(set_to_none=False)
    preds = tnet(timgs, target=anno)
    pt_loss = (torch.cat(preds["target_pts"], dim=0).abs().mean()
               + torch.cat(preds["target_frequency"], dim=0).mean())
    pt_loss.backward()
    cls_g = next(tnet.cls_classifier.parameters()).grad
    assert cls_g is None or not cls_g.detach().numpy().any(), \
        "reference x_cls.detach() cut leaked?"

    ji = jnp.asarray(imgs)
    jc = jnp.asarray(points[..., :2] * pmask[..., None])
    jcnt = jnp.asarray(counts)

    def pt_only(p):
        preds = jnet.apply({"params": p}, ji, jc, jcnt, train=True)
        return (jnp.abs(preds["target_pts"]).mean()
                + preds["target_frequency"].mean())

    g = jax.grad(pt_only)(g_params)
    assert not any(np.abs(np.asarray(x)).any()
                   for x in jax.tree_util.tree_leaves(g["cls_classifier"]))
    # ...while the encoder DOES receive point-loss gradient (no over-cut)
    assert any(np.abs(np.asarray(x)).any()
               for x in jax.tree_util.tree_leaves(g["encoder"]))


def test_transplant_forward_parity(bcp_pair):
    tnet, tdisc, jnet, jdisc, g_params, d_params = bcp_pair
    rng = np.random.default_rng(7)
    imgs, labels, points, pmask, counts = _batch(rng)
    timgs, tlabels, anno = _to_torch(imgs, labels, points, counts)

    with torch.no_grad():
        tpred = tnet(timgs, target=anno)
        fake = [torch.cat([tpred["contours"][i] * W,
                           tpred["target_pts"][i]], dim=1) for i in range(B)]
        t_adv = tdisc(timgs, fake).numpy()

    jc = jnp.asarray(points[..., :2] * pmask[..., None])
    jpred = jnet.apply({"params": g_params}, jnp.asarray(imgs), jc,
                       jnp.asarray(counts), train=True)
    np.testing.assert_allclose(np.asarray(jpred["classes"]),
                               tpred["classes"].numpy(), atol=3e-4, rtol=1e-3)
    j_pts = np.asarray(jpred["target_pts"])
    j_freq = np.asarray(jpred["target_frequency"])
    for i in range(B):
        n = counts[i]
        np.testing.assert_allclose(j_pts[i, :n], tpred["target_pts"][i].numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(j_freq[i, :n],
                                   tpred["target_frequency"][i].numpy(),
                                   atol=5e-4, rtol=1e-3)

    jfake = jnp.concatenate([jc * W, jnp.asarray(j_pts)], axis=-1) \
        * jnp.asarray(pmask)[..., None]
    j_adv = np.asarray(jdisc.apply({"params": d_params}, jnp.asarray(imgs),
                                   jfake, train=True))
    np.testing.assert_allclose(j_adv, t_adv, atol=5e-4, rtol=1e-3)


def test_bcp_training_trajectory(bcp_pair):
    """10 reference D+G GAN iterations vs 10 fused shared-vjp rebuild steps
    from transplanted weights on identical batches: all 8 logged losses
    track (train_BCP.py:40-49)."""
    import torch.nn.functional as F

    tnet, tdisc, jnet, jdisc, g_params, d_params = bcp_pair
    from vaeplay_tpu.train.state import TrainState, torch_adam
    from vaeplay_tpu.train.steps_be_gan import GanState
    from vaeplay_tpu.train.steps_bcp import make_bcp_train_step

    optim = torch.optim.Adam(tnet.parameters(), lr=LR)
    optim_disc = torch.optim.Adam(tdisc.parameters(), lr=LR)

    gs = GanState(
        g=TrainState.create(
            jnet.apply, jax.tree_util.tree_map(jnp.asarray, g_params),
            None, torch_adam(LR)),
        d=TrainState.create(
            jdisc.apply, jax.tree_util.tree_map(jnp.asarray, d_params),
            None, torch_adam(LR)),
    )
    jstep = make_bcp_train_step(jnet, jdisc)

    keys = ("loss_class", "loss_frequency_one", "loss_frequency_zero",
            "loss_total_regress", "loss_key_regress", "d_adv_real",
            "d_adv_fake", "g_adv_loss")
    t_curve = {k: [] for k in keys}
    j_curve = {k: [] for k in keys}
    rng = np.random.default_rng(11)
    for _ in range(STEPS):
        imgs, labels, points, pmask, counts = _batch(rng)
        timgs, tlabels, anno = _to_torch(imgs, labels, points, counts)

        # --- reference D phase (train_BCP.py:69-93)
        with torch.no_grad():
            preds = tnet(timgs, target=anno)
            fake_targets = [
                torch.cat([preds["contours"][i] * W,
                           preds["target_pts"][i]], dim=1) for i in range(B)]
            real_targets = [anno[i]["points"][:, :4] * W for i in range(B)]
        adv_real_out = tdisc(timgs, real_targets)
        adv_fake_out = tdisc(timgs, fake_targets)
        d_real = F.binary_cross_entropy(adv_real_out,
                                        torch.ones_like(adv_real_out))
        d_fake = F.binary_cross_entropy(adv_fake_out,
                                        torch.zeros_like(adv_fake_out))
        optim_disc.zero_grad(set_to_none=False)
        ((d_real + d_fake) * 0.5).backward()
        optim_disc.step()

        # --- reference G phase (train_BCP.py:96-147), against the updated D
        total, tm = _torch_g_losses(tnet, tdisc, timgs, tlabels, anno)
        optim.zero_grad(set_to_none=False)
        total.backward()
        optim.step()
        tm = {**{k: float(v) for k, v in tm.items()},
              "d_adv_real": float(d_real), "d_adv_fake": float(d_fake)}

        # --- fused rebuild step
        gs, jm = jstep(gs, jnp.asarray(imgs), jnp.asarray(labels),
                       jnp.asarray(points), jnp.asarray(pmask))
        for k in keys:
            t_curve[k].append(tm[k])
            j_curve[k].append(float(jm[k]))

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
