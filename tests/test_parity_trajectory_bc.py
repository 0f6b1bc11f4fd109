"""BC training-trajectory parity gate (round-4 VERDICT item 1).

BC's riskiest rewiring is the mid-forward host contour bridge
(networks_BC.py:208-241): the reference thresholds the predicted mask on the
CPU, traces the largest contour, and bicubic-gathers per-point features for
an attention+FC refine head — the rebuild re-expresses this as fixed
capacity + mask with one batched gather (models/bc.py) and a two-program
external bridge (train/steps_bc.py).

Tracer note: this environment has neither skimage nor cv2, so BOTH sides
run the rebuild's contour tracer (ops/contour.py — golden-gated against
hand-computed marching-squares cases in tests/test_contour_goldens.py,
reference semantics tools/utils.py:73-125).  The trajectory feeds the
torch-traced contours of each step to the flax step (the external-contour
mode the axon runtime uses anyway): a 0.5-threshold trace of a random-init
mask flips pixels under f32 noise, so tracing each side's own mask would
gate the threshold's chaos, not the training wiring.  The flax-side trace
path itself is gated by test_trace_convention_parity on deterministic
masks.

CPU-shim notes (CUDA semantics reproduced):
  - reference `resample_feature` normalizes its contour argument IN PLACE
    (networks_BC.py:64-66) after `.to(device)` — a copy on CUDA, an alias on
    CPU; the fixture wraps it to pass clones, so `preds["contours"]` stays
    in pixel coords as on the reference's GPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # excluded from the fast tier

IMG, B, MP, STEPS = 128, 2, 64, 8
LR = 1e-4  # train_BC.py:129


@pytest.fixture(scope="module")
def bc_pair(reference_torch_env):
    from tests import torch_fpn_shim

    torch_fpn_shim.install(reference_torch_env)
    mp = reference_torch_env

    import models.networks_BC as ref_bc  # reference, read-only

    from vaeplay_tpu.ops import contour as jcontour

    # shared tracer (see module docstring)
    mp.setattr(ref_bc, "find_contour",
               lambda m: jcontour.find_contour(m, level=0.8))
    mp.setattr(ref_bc, "resample_points", jcontour.resample_points)
    orig_resample = ref_bc.resample_feature
    mp.setattr(ref_bc, "resample_feature",
               lambda feature, contours, max_points=MP: orig_resample(
                   feature, [c.clone() for c in contours],
                   max_points=max_points))

    torch.manual_seed(0)
    tnet = ref_bc.ComposeNet(padding=1, max_points=MP)  # train_BC.py:126
    tnet.train()

    from vaeplay_tpu.models.bc import ComposeNet
    from vaeplay_tpu.models.torch_convert import bc_from_torch
    from vaeplay_tpu.utils.jitting import jit_init

    jnet = ComposeNet(max_points=MP)
    gv = jit_init(jnet, {"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, IMG, IMG, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    params, stats, consts = bc_from_torch(sd, gv)
    return tnet, jnet, params, stats, consts


def _gt_masks(rng):
    yy, xx = np.mgrid[0:IMG, 0:IMG]
    bimgs = np.zeros((B, IMG, IMG, 1), np.float32)
    eimgs = np.zeros((B, IMG, IMG, 1), np.float32)
    for i in range(B):
        cy, cx = rng.integers(IMG // 4, 3 * IMG // 4, 2)
        r = rng.integers(IMG // 8, IMG // 4)
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        bimgs[i, :, :, 0] = (d2 <= r * r).astype(np.float32)
        eimgs[i, :, :, 0] = ((d2 <= r * r) & (d2 >= (r - 3) ** 2)).astype(np.float32)
    return bimgs, eimgs


def _gt_contours(bimgs):
    """GT + RDP key contours from the GT masks (BCDataset preprocess idiom,
    dataset.py:242-254), identical ragged lists for both sides."""
    from vaeplay_tpu.ops import contour as jcontour

    cnts, keys = [], []
    for i in range(bimgs.shape[0]):
        c = jcontour.find_contour(bimgs[i, :, :, 0], level=0.8)
        c = jcontour.resample_points(c, 2048).astype(np.float32)
        k = jcontour.rdp_simplify(c, epsilon=4.0).astype(np.float32)
        cnts.append(c)
        keys.append(k)
    return cnts, keys


def _pad_pts(lists, cap):
    pts = np.zeros((len(lists), cap, 2), np.float32)
    mask = np.zeros((len(lists), cap), np.float32)
    for i, c in enumerate(lists):
        n = min(len(c), cap)
        if n:
            pts[i, :n] = c[:n]
            mask[i, :n] = 1.0
    return pts, mask


def _batch(rng):
    imgs = rng.uniform(size=(B, IMG, IMG, 3)).astype(np.float32)
    bimgs, eimgs = _gt_masks(rng)
    return imgs, bimgs, eimgs


def test_trace_convention_parity(bc_pair):
    """The flax-side trace (padded sigmoid → threshold → largest contour →
    decimate) produces the same points as the reference pipeline on
    deterministic masks."""
    tnet, jnet, params, stats, consts = bc_pair
    import models.networks_BC as ref_bc

    from vaeplay_tpu.ops.contour import batch_find_contours

    rng = np.random.default_rng(5)
    bimgs, _ = _gt_masks(rng)
    tm = torch.from_numpy(bimgs.transpose(0, 3, 1, 2).copy())
    padded = torch.nn.functional.pad(tm, (1, 1, 1, 1), "constant", 0)
    t_cnts = ref_bc.find_tensor_contour(padded, max_points=MP)

    j_padded = np.pad(bimgs[..., 0], ((0, 0), (1, 1), (1, 1)))
    j_pts, j_counts = batch_find_contours(j_padded, max_points=MP,
                                          threshold=0.5)
    for i in range(B):
        n = int(j_counts[i])
        assert n == t_cnts[i].size(0)
        np.testing.assert_array_equal(j_pts[i, :n], t_cnts[i].numpy())


def test_transplant_forward_parity(bc_pair):
    """Step-0 parity with a SHARED contour set (external-contour mode both
    sides): mask/edge logits and the refine regressions agree."""
    tnet, jnet, params, stats, consts = bc_pair
    import models.networks_BC as ref_bc

    rng = np.random.default_rng(7)
    imgs, bimgs, eimgs = _batch(rng)
    cnts, _ = _gt_contours(bimgs)
    cnts = [c[:MP] for c in cnts]
    shared = [torch.from_numpy(c.copy()) for c in cnts]

    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
    tnet.eval()
    with torch.no_grad(), pytest.MonkeyPatch.context() as m2:
        m2.setattr(ref_bc, "find_tensor_contour",
                   lambda x, max_points=MP, threshold=0.5: [
                       s.clone() for s in shared])
        tpred = tnet(timgs)
    tnet.train()

    pts, mask = _pad_pts(cnts, MP)
    counts = mask.sum(axis=1).astype(np.int32)
    jpred = jnet.apply(
        {"params": params, "batch_stats": stats, "constants": consts},
        jnp.asarray(imgs), train=False,
        contours=(jnp.asarray(pts), jnp.asarray(counts)))
    np.testing.assert_allclose(np.asarray(jpred["masks"])[..., 0],
                               tpred["masks"].numpy()[:, 0],
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(jpred["edges"])[..., 0],
                               tpred["edges"].numpy()[:, 0],
                               atol=2e-3, rtol=1e-2)
    j_regs = np.asarray(jpred["contour_regressions"])
    t_regs = tpred["contour_regressions"].numpy()
    for i in range(B):
        n = int(counts[i])
        np.testing.assert_allclose(j_regs[i, :n], t_regs[i, :n],
                                   atol=3e-3, rtol=1e-2)


def test_bc_training_trajectory(bc_pair):
    """8 reference iterations (internal trace from its own mask) vs 8
    external-contour rebuild steps consuming the SAME per-step contours:
    all 3 logged losses track (train_BC.py:63-66)."""
    import torch.nn.functional as F
    import tools.ops as ref_ops

    tnet, jnet, params, stats, consts = bc_pair
    from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
    from vaeplay_tpu.train.steps_bc import make_bc_train_step

    opt = torch.optim.Adam(tnet.parameters(), lr=LR)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    state = TrainState.create(jnet.apply, to_j(params), to_j(stats),
                              frozen_backbone_adam(LR), constants=to_j(consts))
    jstep = make_bc_train_step(jnet, max_points=MP, external_contours=True)

    keys = ("loss_mask", "loss_edge", "loss_regress")
    t_curve = {k: [] for k in keys}
    j_curve = {k: [] for k in keys}
    rng = np.random.default_rng(11)
    for _ in range(STEPS):
        imgs, bimgs, eimgs = _batch(rng)
        gt_cnts, gt_keys = _gt_contours(bimgs)
        timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
        tbi = torch.from_numpy(bimgs.transpose(0, 3, 1, 2).copy())
        tei = torch.from_numpy(eimgs.transpose(0, 3, 1, 2).copy())
        t_gt = [torch.from_numpy(c.copy()) for c in gt_cnts]
        t_key = [torch.from_numpy(c.copy()) for c in gt_keys]

        # --- reference iteration (train_BC.py:52-68)
        preds = tnet(timgs)
        pe, pm = preds["edges"], preds["masks"]
        loss_edge = (0.5 * F.binary_cross_entropy_with_logits(pe, tei)
                     + ref_ops.compute_dice_loss(pe.sigmoid(), tei))
        loss_mask = (0.5 * F.binary_cross_entropy_with_logits(pm, tbi)
                     + ref_ops.compute_dice_loss(pm.sigmoid(), tbi))
        loss_regress = ref_ops.compute_pt_regression_loss(
            preds["contours"], preds["contour_regressions"], t_gt, t_key)
        opt.zero_grad(set_to_none=False)
        (loss_edge + loss_mask + loss_regress).backward()
        opt.step()

        # --- rebuild step on the SAME contours the torch trace produced
        step_cnts = [c.detach().numpy() for c in preds["contours"]]
        pts, pmask = _pad_pts(step_cnts, MP)
        counts = pmask.sum(axis=1).astype(np.int32)
        tgt_pts, tgt_mask = _pad_pts(gt_cnts, 2048)
        key_pts, key_mask = _pad_pts(gt_keys, 256)
        state, jm = jstep(state, jnp.asarray(imgs), jnp.asarray(pts),
                          jnp.asarray(counts), jnp.asarray(bimgs),
                          jnp.asarray(eimgs), jnp.asarray(tgt_pts),
                          jnp.asarray(tgt_mask), jnp.asarray(key_pts),
                          jnp.asarray(key_mask))
        t_curve["loss_mask"].append(float(loss_mask))
        t_curve["loss_edge"].append(float(loss_edge))
        t_curve["loss_regress"].append(float(loss_regress))
        for k in keys:
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
