"""BE training-trajectory parity gate (round-4 VERDICT item 1).

BE is the template supervised path (train_BE.py:30-78): one Adam over a
resnet50-FPN ComposeNet, loss = (0.5·BCE-with-logits + dice) per head.  The
rebuild's risk surface is the backbone transplant (torchvision layout →
flax, FrozenBatchNorm), the frozen conv1/layer1 stem
(trainable_layers=3), and the s2d predictor-tail rewrite
(SmallChannelConv3x3S1) — gated here against the live torch reference
via tests/torch_fpn_shim.py (no torchvision wheel in this environment).

Gates: step-0 forward parity from transplanted weights, then 8-step
loss-curve tracking (loss_mask / loss_edge, train_BE.py:58-60).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # excluded from the fast tier

IMG, B, STEPS = 128, 2, 8
LR = 1e-4  # train_BE.py:131


@pytest.fixture(scope="module")
def be_pair(reference_torch_env):
    from tests import torch_fpn_shim

    torch_fpn_shim.install(reference_torch_env)

    import models.networks_BE as ref  # reference, read-only
    import tools.ops as ref_ops

    torch.manual_seed(0)
    tnet = ref.ComposeNet()
    ref_ops.initialize_model(tnet.feature_net.aux_convs)  # train_BE.py:125-127
    ref_ops.initialize_model(tnet.mask_net)
    ref_ops.initialize_model(tnet.edge_net)
    tnet.train()

    from vaeplay_tpu.models.be import ComposeNet
    from vaeplay_tpu.models.torch_convert import be_from_torch
    from vaeplay_tpu.utils.jitting import jit_init

    jnet = ComposeNet()
    gv = jit_init(jnet, {"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, IMG, IMG, 3)))
    sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    params, stats, consts = be_from_torch(sd, gv)
    return tnet, jnet, params, stats, consts


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
        eimgs[i, :, :, 0] = ((d2 <= r * r) & (d2 >= (r - 3) ** 2)).astype(np.float32)
    return imgs, bimgs, eimgs


def test_transplant_forward_parity(be_pair):
    tnet, jnet, params, stats, consts = be_pair
    rng = np.random.default_rng(7)
    imgs, bimgs, eimgs = _batch(rng)
    tnet.eval()
    with torch.no_grad():
        tpred = tnet(torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy()))
    tnet.train()
    jpred = jnet.apply({"params": params, "batch_stats": stats,
                        "constants": consts}, jnp.asarray(imgs), train=False)
    np.testing.assert_allclose(np.asarray(jpred["masks"])[..., 0],
                               tpred["masks"].numpy()[:, 0],
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(jpred["edges"])[..., 0],
                               tpred["edges"].numpy()[:, 0],
                               atol=2e-3, rtol=1e-2)


def test_be_training_trajectory(be_pair):
    """8 reference iterations vs 8 fused rebuild steps from transplanted
    weights on identical batches (train_BE.py:46-64)."""
    import torch.nn.functional as F
    import tools.ops as ref_ops

    tnet, jnet, params, stats, consts = be_pair
    from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
    from vaeplay_tpu.train.steps_be import make_be_train_step

    opt = torch.optim.Adam(tnet.parameters(), lr=LR)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    state = TrainState.create(jnet.apply, to_j(params), to_j(stats),
                              frozen_backbone_adam(LR), constants=to_j(consts))
    jstep = make_be_train_step(jnet)

    keys = ("loss_mask", "loss_edge")
    t_curve = {k: [] for k in keys}
    j_curve = {k: [] for k in keys}
    rng = np.random.default_rng(11)
    for _ in range(STEPS):
        imgs, bimgs, eimgs = _batch(rng)
        timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
        tbi = torch.from_numpy(bimgs.transpose(0, 3, 1, 2).copy())
        tei = torch.from_numpy(eimgs.transpose(0, 3, 1, 2).copy())

        preds = tnet(timgs)
        pe, pm = preds["edges"], preds["masks"]
        loss_edge = (0.5 * F.binary_cross_entropy_with_logits(pe, tei)
                     + ref_ops.compute_dice_loss(pe.sigmoid(), tei))
        loss_mask = (0.5 * F.binary_cross_entropy_with_logits(pm, tbi)
                     + ref_ops.compute_dice_loss(pm.sigmoid(), tbi))
        opt.zero_grad(set_to_none=False)
        (loss_edge + loss_mask).backward()
        opt.step()

        state, jm = jstep(state, jnp.asarray(imgs), jnp.asarray(bimgs),
                          jnp.asarray(eimgs))
        t_curve["loss_mask"].append(float(loss_mask))
        t_curve["loss_edge"].append(float(loss_edge))
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
