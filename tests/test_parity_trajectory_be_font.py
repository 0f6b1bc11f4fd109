"""BE_font training-trajectory parity gate (round-3 VERDICT item 3).

BE_font's risky rewiring is the 3-optimizer step (train_BE_font.py:97-170):

  D phase    Adam over disc; G forward under no_grad (BN stats still update).
  G phase    Adam over ALL generator params; keeps the reference's
             `loss_g_aux = loss_g_adv * 5` bug (:142 — the aux CE is computed
             but never reaches the G loss).
  S phase    a SECOND Adam over net.style_encoder.parameters() ONLY — the
             same tensors the full-net Adam also owns — stepping a
             style-distillation loss: the y=None self-encoded forward's
             masks/edges pulled toward the (updated-G, label-conditioned)
             no-grad predictions.

The rebuild fuses all three phases into one jit program
(train/steps_be_font.py) with the style-only Adam expressed as an
optax.multi_transform over the shared param tree.  Per-iteration BN
running-stat updates (4 on G, 3 on D, in reference call order) are threaded
through the fused step, so curve tracking exercises them too.

CPU-shim notes: `zero_grad(set_to_none=False)` for the torch-1.x semantics
the reference targets (same reasoning as test_parity_trajectory_bp.py);
networks_BE_font.py does `from turtle import shape` (an unused stray import)
— turtle needs tkinter, absent headless, so a stub module is installed.
"""

import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')

IMG, B, STEPS = 32, 3, 8
LR = 1e-4  # train_BE_font.py:280-282


def _stub_vision_deps():
    import sys

    for name in ("cv2", "rdp"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = sk.measure
    if "turtle" not in sys.modules:
        turtle = types.ModuleType("turtle")
        turtle.shape = None  # networks_BE_font.py:2 imports, never uses
        sys.modules["turtle"] = turtle
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models_m = types.ModuleType("torchvision.models")
        resnet_m = types.ModuleType("torchvision.models.resnet")
        det_m = types.ModuleType("torchvision.models.detection")
        bb_m = types.ModuleType("torchvision.models.detection.backbone_utils")
        tf_m = types.ModuleType("torchvision.transforms")
        tff_m = types.ModuleType("torchvision.transforms.functional")
        resnet_m.resnet18 = resnet_m.resnet34 = lambda *a, **k: None
        bb_m.resnet_fpn_backbone = lambda *a, **k: None
        tv.models = models_m
        tv.transforms = tf_m
        tf_m.functional = tff_m
        models_m.resnet = resnet_m
        models_m.detection = det_m
        det_m.backbone_utils = bb_m
        for name, mod in (("torchvision", tv),
                          ("torchvision.models", models_m),
                          ("torchvision.models.resnet", resnet_m),
                          ("torchvision.models.detection", det_m),
                          ("torchvision.models.detection.backbone_utils", bb_m),
                          ("torchvision.transforms", tf_m),
                          ("torchvision.transforms.functional", tff_m)):
            sys.modules[name] = mod


@pytest.fixture(scope="module")
def font_pair(reference_torch_env):
    _stub_vision_deps()
    import models.networks_BE_font as ref_font  # reference, read-only

    torch.manual_seed(0)
    tnet = ref_font.ComposeNet(IMG)
    tdisc = ref_font.Discriminator(IMG, 2, 143)
    tnet.train()
    tdisc.train()

    from vaeplay_tpu.models.be_font import ComposeNet, Discriminator
    from vaeplay_tpu.models.torch_convert import (
        be_font_disc_from_torch, be_font_from_torch)

    def sd(m):
        # .copy(): torch optimizer steps must not mutate the transplanted jax
        # weights through shared numpy views
        return {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}

    g_params, g_stats = be_font_from_torch(sd(tnet), IMG)
    d_params, d_stats = be_font_disc_from_torch(sd(tdisc), IMG)
    jnet = ComposeNet(in_size=IMG)
    jdisc = Discriminator(in_size=IMG)
    return (tnet, tdisc), (jnet, jdisc), (g_params, g_stats, d_params, d_stats)


def _batch(rng):
    imgs = rng.uniform(size=(B, IMG, IMG, 3)).astype(np.float32)
    masks = (rng.uniform(size=(B, IMG, IMG, 1)) < 0.3).astype(np.float32)
    edges = (rng.uniform(size=(B, IMG, IMG, 1)) < 0.1).astype(np.float32)
    labels = rng.integers(0, 143, size=(B,))
    styles = rng.uniform(size=(B, 5)).astype(np.float32)
    return imgs, masks, edges, labels.astype(np.int64), styles


def _t_y_map(labels, styles):
    b = labels.shape[0]
    onehot = torch.zeros((b, 143), dtype=torch.float32)
    onehot[torch.arange(b), torch.from_numpy(labels)] = 1
    return {"cls": onehot, "cnt_style": torch.from_numpy(styles.copy())}


def _nchw(x):
    return torch.from_numpy(x.transpose(0, 3, 1, 2).copy())


def test_transplant_forward_parity(font_pair):
    """Step-0 converter sanity: G both conditioning routes + D heads."""
    (tnet, tdisc), (jnet, jdisc), (gp, gs, dp, ds) = font_pair
    rng = np.random.default_rng(3)
    imgs, masks, edges, labels, styles = _batch(rng)
    y_map = _t_y_map(labels, styles)

    tnet.eval()
    tdisc.eval()
    try:
        with torch.no_grad():
            t_lab = tnet(_nchw(imgs), y=y_map)
            t_self = tnet(_nchw(imgs))
            merge = torch.cat([torch.from_numpy(masks.transpose(0, 3, 1, 2)),
                               torch.from_numpy(edges.transpose(0, 3, 1, 2))], dim=1)
            t_adv, t_aux = tdisc(merge, y_map)
    finally:
        tnet.train()
        tdisc.train()

    ji = jnp.asarray(imgs)
    jy = {"cls": jnp.asarray(np.eye(143, dtype=np.float32)[labels]),
          "cnt_style": jnp.asarray(styles)}
    j_lab = jnet.apply({"params": gp, "batch_stats": gs}, ji, jy, train=False)
    j_self = jnet.apply({"params": gp, "batch_stats": gs}, ji, None, train=False)
    for key in ("masks", "edges"):
        np.testing.assert_allclose(
            np.asarray(j_lab[key])[..., 0], t_lab[key].numpy()[:, 0],
            atol=5e-4, rtol=1e-3, err_msg=f"label-route {key}")
        np.testing.assert_allclose(
            np.asarray(j_self[key])[..., 0], t_self[key].numpy()[:, 0],
            atol=5e-4, rtol=1e-3, err_msg=f"self-encode-route {key}")
    j_merge = jnp.concatenate([jnp.asarray(masks), jnp.asarray(edges)], axis=-1)
    j_adv, j_aux = jdisc.apply({"params": dp, "batch_stats": ds}, j_merge, jy,
                               train=False)
    np.testing.assert_allclose(np.asarray(j_adv), t_adv.numpy(), atol=5e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_aux), t_aux.numpy(), atol=2e-3,
                               rtol=1e-3)


def _torch_iteration(tnet, tdisc, optim, optim_style, optim_disc, batch):
    """One reference 3-phase iteration (train_BE_font.py:97-170), verbatim
    semantics; returns the logged metric dict."""
    import torch.nn.functional as F
    import tools.ops as ops  # reference, read-only (sys.path-prepended)

    imgs, masks, edges, labels, styles = batch
    timgs = _nchw(imgs)
    tmasks = torch.from_numpy(masks.transpose(0, 3, 1, 2).copy())
    tedges = torch.from_numpy(edges.transpose(0, 3, 1, 2).copy())
    tlabels = torch.from_numpy(labels.copy())
    y_map = _t_y_map(labels, styles)
    b = timgs.size(0)

    # ---- D phase (:97-112)
    gt_merge = torch.cat([tmasks, tedges], dim=1)
    with torch.no_grad():
        preds = tnet(timgs, y=y_map)
        pred_merge = torch.cat([preds["masks"].detach(),
                                preds["edges"].detach()], dim=1)
    d_gt_adv, d_adv_aux = tdisc(gt_merge, y_map)
    d_pred_adv, _ = tdisc(pred_merge, y_map)
    optim_disc.zero_grad(set_to_none=False)
    d_adv_real = F.binary_cross_entropy(d_gt_adv, torch.ones((b, 1)))
    d_aux_real = F.cross_entropy(d_adv_aux, tlabels)
    d_adv_fake = F.binary_cross_entropy(d_pred_adv, torch.zeros((b, 1)))
    ((d_adv_real + d_adv_fake) * 0.5 + d_aux_real).backward()
    optim_disc.step()

    # ---- G phase (:114-147)
    preds = tnet(timgs, y=y_map)
    pm, pe = preds["masks"], preds["edges"]
    g_adv, g_aux = tdisc(torch.cat([pm, pe], dim=1), y_map)
    optim.zero_grad(set_to_none=False)
    loss_mask = (0.5 * F.binary_cross_entropy_with_logits(pm, tmasks)
                 + ops.compute_dice_loss(pm.sigmoid(), tmasks)) * 10
    loss_edge = (0.5 * F.binary_cross_entropy_with_logits(pe, tedges)
                 + ops.compute_dice_loss(pe.sigmoid(), tedges)) * 10
    loss_g_adv = F.binary_cross_entropy(g_adv, torch.ones((b, 1))) * 2
    loss_g_aux = loss_g_adv * 5  # reference bug kept (train_BE_font.py:142)
    (loss_edge + loss_mask + loss_g_adv + loss_g_aux).backward()
    optim.step()

    # ---- S phase (:150-170)
    with torch.no_grad():
        preds = tnet(timgs, y=y_map)
        ref_m, ref_e = preds["masks"], preds["edges"]
    preds = tnet(timgs)
    pm_, pe_ = preds["masks"], preds["edges"]
    optim_style.zero_grad(set_to_none=False)
    loss_mask_ = (0.5 * F.binary_cross_entropy_with_logits(pm_, tmasks)
                  + ops.compute_dice_loss(pm_.sigmoid(), tmasks))
    loss_edge_ = (0.5 * F.binary_cross_entropy_with_logits(pe_, tedges)
                  + ops.compute_dice_loss(pe_.sigmoid(), tedges))
    loss_embed = (F.l1_loss(pm_, ref_m) + F.l1_loss(pe_, ref_e)) * 2.0
    (loss_mask_ + loss_edge_ + loss_embed).backward()
    optim_style.step()

    return {k: float(v) for k, v in {
        "loss_edge": loss_edge, "loss_mask": loss_mask,
        "d_adv_real": d_adv_real, "d_aux_real": d_aux_real,
        "d_adv_fake": d_adv_fake, "loss_g_adv": loss_g_adv,
        "loss_g_aux": loss_g_aux, "loss_embed": loss_embed}.items()}


def test_be_font_training_trajectory(font_pair):
    """8 reference 3-phase iterations vs 8 fused rebuild steps from
    transplanted weights on identical batches: all 8 logged losses track."""
    (tnet, tdisc), (jnet, jdisc), (gp, gs, dp, ds) = font_pair
    from vaeplay_tpu.train.steps_be_font import (
        create_font_state, make_be_font_train_step)

    optim = torch.optim.Adam(tnet.parameters(), lr=LR)
    optim_style = torch.optim.Adam(tnet.style_encoder.parameters(), lr=LR)
    optim_disc = torch.optim.Adam(tdisc.parameters(), lr=LR)

    as_j = lambda t: jnp.asarray(np.asarray(t))
    import jax

    fs = create_font_state(
        jnet, jdisc,
        {"params": jax.tree_util.tree_map(as_j, gp),
         "batch_stats": jax.tree_util.tree_map(as_j, gs)},
        {"params": jax.tree_util.tree_map(as_j, dp),
         "batch_stats": jax.tree_util.tree_map(as_j, ds)}, LR)
    jstep = make_be_font_train_step(jnet, jdisc, LR)

    keys = ("loss_edge", "loss_mask", "d_adv_real", "d_aux_real",
            "d_adv_fake", "loss_g_adv", "loss_g_aux", "loss_embed")
    t_curve = {k: [] for k in keys}
    j_curve = {k: [] for k in keys}
    rng = np.random.default_rng(11)
    for _ in range(STEPS):
        batch = _batch(rng)
        tm = _torch_iteration(tnet, tdisc, optim, optim_style, optim_disc,
                              batch)
        imgs, masks, edges, labels, styles = batch
        fs, jm = jstep(fs, jnp.asarray(imgs), jnp.asarray(masks),
                       jnp.asarray(edges), jnp.asarray(labels),
                       jnp.asarray(styles))
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
