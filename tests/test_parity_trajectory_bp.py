"""BP training-trajectory parity gate (round-3 VERDICT item 3).

BP's riskiest rewiring is the two-pass teacher-forced step
(/root/reference/train_BP.py:63-99): pass 1 backprops ellipse L1 + emit-line
losses through the full model — with the emit-line stage consuming DETACHED
ellipse params (networks_BP.py:256) — then pass 2 re-runs the emit-line
predictor with ground-truth ellipse params (x VALUE_WEIGHT, train_BP.py:85)
and backprops the stage-2 loss only, through the SAME single Adam.  The
rebuild fuses both passes into one jit program (train/steps_bp.py).

Gates, in order of sharpness:
  1. exact-zero gradient-cut checks on BOTH sides (any-dtype-exact): the
     stage-2 losses must not reach the encoder/ellipse predictor (the
     .detach() cut), and the ellipse loss must not reach the emit-line nets;
  2. step-0 forward parity from transplanted weights;
  3. 10-step loss-curve tracking of the full two-pass step.

CPU-shim notes (GPU semantics reproduced faithfully):
  - `.cpu()` is patched to `.clone()`: on the reference's CUDA device,
    `ellipse_params.detach().cpu()` (networks_BP.py:256) COPIES, so the
    emit-line stage's in-place `params[:, :4] /= VALUE_WEIGHT`
    (networks_BP.py:233) never mutates the live ellipse_params.  On a bare
    CPU run `.cpu()` is a no-op alias and the reference would crash in
    backward — an artifact of the shim, not reference semantics.
  - `compute_ellipse_param_loss` mutates its gt argument in place
    (tools/ops.py:71) AFTER `.to(device)`, which on CUDA is a copy; we pass
    a clone for the same reason.
  - `zero_grad(set_to_none=False)`: the reference targets the torch 1.x
    default, where phase-2's untouched params carry ZERO grads (Adam steps
    them on decayed momentum) — exactly the fused rebuild's semantics.
    torch 2.x's set_to_none=True default would instead SKIP them.

SAMPLE_COUNT is patched to 180 on both sides (identical math at a quarter
the attention cost; the reference reads the module global at call time).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')

IMG, B, STEPS, S = 64, 2, 10, 180
LR = 1e-3  # train_BP.py:176


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
        # networks_BP imports resnet50/densenet121 but never calls them (the
        # backbone lines are commented out, networks_BP.py:22-33)
        tv = types.ModuleType("torchvision")
        models_m = types.ModuleType("torchvision.models")
        resnet_m = types.ModuleType("torchvision.models.resnet")
        dense_m = types.ModuleType("torchvision.models.densenet")
        tf_m = types.ModuleType("torchvision.transforms")
        tff_m = types.ModuleType("torchvision.transforms.functional")
        resnet_m.resnet50 = lambda *a, **k: None
        dense_m.densenet121 = lambda *a, **k: None
        tv.models = models_m
        tv.transforms = tf_m
        tf_m.functional = tff_m
        models_m.resnet = resnet_m
        models_m.densenet = dense_m
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models_m
        sys.modules["torchvision.models.resnet"] = resnet_m
        sys.modules["torchvision.models.densenet"] = dense_m
        sys.modules["torchvision.transforms"] = tf_m
        sys.modules["torchvision.transforms.functional"] = tff_m


@pytest.fixture(scope="module")
def bp_pair(reference_torch_env):
    mp = reference_torch_env
    _stub_vision_deps()
    mp.setattr(torch.Tensor, "cpu", lambda self, *a, **k: self.clone())

    import models.networks_BP as ref_bp  # reference, read-only

    mp.setattr(ref_bp, "SAMPLE_COUNT", S)
    import vaeplay_tpu.models.bp as jbp

    mp.setattr(jbp, "SAMPLE_COUNT", S)

    torch.manual_seed(0)
    tnet = ref_bp.ComposeNet(IMG)
    tnet.train()

    from vaeplay_tpu.models.torch_convert import bp_from_torch

    sd = {k: v.detach().numpy().copy() for k, v in tnet.state_dict().items()}
    params = bp_from_torch(sd)
    jnet = jbp.ComposeNet(image_size=IMG)
    return tnet, jnet, params


def _batch(rng):
    imgs = rng.uniform(size=(B, IMG, IMG, 3)).astype(np.float32)
    p1 = np.stack([
        np.concatenate([rng.uniform(-0.3, 0.3, 2), rng.uniform(0.25, 0.55, 2),
                        rng.integers(10, 40, 1).astype(np.float64)])
        for _ in range(B)
    ]).astype(np.float32)
    trig = (rng.uniform(size=(B, S)) < 0.4).astype(np.float32)
    xy = rng.uniform(-0.9, 0.9, (B, S, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, (B, S)).astype(np.float32)
    dxy = np.stack([np.cos(ang), np.sin(ang)], axis=-1)
    length = rng.uniform(0.1, 0.3, (B, S, 1)).astype(np.float32)
    p2 = np.concatenate([trig[..., None], xy, dxy, length],
                        axis=-1).astype(np.float32)
    return imgs, p1, p2


def _torch_losses(tnet, imgs, p1, p2, phase):
    """Reference loss graphs for phase 1 / phase 2 (train_BP.py:63-99)."""
    import tools.ops as ops  # reference, read-only (sys.path-prepended)
    timgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
    tp1 = torch.from_numpy(p1.copy())
    tp2 = [torch.from_numpy(p2[i].copy()) for i in range(B)]
    if phase == 1:
        preds = tnet(timgs)
        el = ops.compute_ellipse_param_loss(preds["ellipse_params"],
                                            tp1.clone())
        pt = ops.compute_ellipse_pt_loss(preds, tp2)
        return {**el, **pt}, preds
    tp1s = tp1.clone()
    tp1s[:, :4] = tp1s[:, :4] * ref_value_weight()
    if_triggers, line_params, sample_infos = tnet.emit_line_predictor(
        timgs, tp1s)
    preds = {"if_triggers": if_triggers, "line_params": line_params,
             "sample_infos": sample_infos}
    pt = ops.compute_ellipse_pt_loss(preds, tp2)
    return {"pos_trig_loss": pt["trig_loss"],
            "pos_param_loss": pt["param_loss"]}, preds


def ref_value_weight():
    import sys

    return sys.modules["models.networks_BP"].VALUE_WEIGHT


def _grad_of(mod):
    w = next(mod.parameters())
    return None if w.grad is None else w.grad.detach().numpy().copy()


def test_gradient_cuts_exact(bp_pair):
    """The detach/teacher-forcing cuts, asserted as EXACT ZEROS both sides."""
    tnet, jnet, params = bp_pair
    from vaeplay_tpu.ops import losses as L
    from vaeplay_tpu.train.steps_bp import _pt_loss

    rng = np.random.default_rng(5)
    imgs, p1, p2 = _batch(rng)
    ji, jp1, jp2 = jnp.asarray(imgs), jnp.asarray(p1), jnp.asarray(p2)

    # --- torch: stage-2 losses in phase 1 must not reach encoder/ellipse
    tnet.zero_grad(set_to_none=False)
    m, _ = _torch_losses(tnet, imgs, p1, p2, phase=1)
    (m["trig_loss"] + m["param_loss"]).backward()
    enc_g = _grad_of(tnet.encoder)
    ell_g = _grad_of(tnet.ellipse_predictor)
    for g in (enc_g, ell_g):
        assert g is None or not np.abs(g).any(), "reference detach cut leaked?"

    # --- jax: same cut
    def pt_only(p):
        preds = jnet.apply({"params": p}, ji, train=True)
        pt = _pt_loss(preds, jp2)
        return pt["trig_loss"] + pt["param_loss"]

    g = jax.grad(pt_only)(params)
    assert not any(np.abs(np.asarray(x)).any()
                   for x in jax.tree_util.tree_leaves(g["encoder"]))
    assert not any(np.abs(np.asarray(x)).any()
                   for x in jax.tree_util.tree_leaves(g["ellipse_predictor"]))
    # ...and the ellipse loss must not reach the emit-line nets
    def el_only(p):
        preds = jnet.apply({"params": p}, ji, train=True)
        el = L.ellipse_param_loss(preds["ellipse_params"], jp1)
        return el["loss_cx"] + el["loss_cy"] + el["loss_rest"]

    g = jax.grad(el_only)(params)
    assert not any(np.abs(np.asarray(x)).any()
                   for x in jax.tree_util.tree_leaves(g["emit_line_predictor"]))

    # --- phase 2 (teacher-forced) touches ONLY the emit-line nets, both sides
    tnet.zero_grad(set_to_none=False)
    m2, _ = _torch_losses(tnet, imgs, p1, p2, phase=2)
    (m2["pos_trig_loss"] + m2["pos_param_loss"]).backward()
    enc_g = _grad_of(tnet.encoder)
    assert enc_g is None or not np.abs(enc_g).any()
    assert np.abs(_grad_of(tnet.emit_line_predictor)).any()

    def phase2(p):
        p1s = jp1.at[:, :4].set(jp1[:, :4] * 10.0)
        preds = jnet.apply({"params": p}, ji, p1s, train=True,
                           method=jnet.emit_line_only)
        pt = _pt_loss(preds, jp2)
        return pt["trig_loss"] + pt["param_loss"]

    g = jax.grad(phase2)(params)
    assert not any(np.abs(np.asarray(x)).any()
                   for x in jax.tree_util.tree_leaves(g["encoder"]))
    assert not any(np.abs(np.asarray(x)).any()
                   for x in jax.tree_util.tree_leaves(g["ellipse_predictor"]))
    assert any(np.abs(np.asarray(x)).any()
               for x in jax.tree_util.tree_leaves(g["emit_line_predictor"]))


def test_transplant_forward_parity(bp_pair):
    tnet, jnet, params = bp_pair
    rng = np.random.default_rng(7)
    imgs, p1, p2 = _batch(rng)
    with torch.no_grad():
        _, tpred = _torch_losses(tnet, imgs, p1, p2, phase=1)
    jpred = jnet.apply({"params": params}, jnp.asarray(imgs), train=False)
    np.testing.assert_allclose(
        np.asarray(jpred["ellipse_params"]),
        tpred["ellipse_params"].numpy(), atol=2e-4, rtol=1e-3)
    t_trig = torch.stack(tpred["if_triggers"], dim=0).numpy()
    np.testing.assert_allclose(np.asarray(jpred["if_triggers"]).reshape(B, S, 2),
                               t_trig.reshape(B, S, 2), atol=3e-4, rtol=1e-3)
    t_line = torch.stack(tpred["line_params"], dim=0).numpy()
    np.testing.assert_allclose(np.asarray(jpred["line_params"]).reshape(B, S, 4),
                               t_line.reshape(B, S, 4), atol=3e-4, rtol=1e-3)


def test_bp_training_trajectory(bp_pair):
    """10 reference two-pass iterations vs 10 fused rebuild steps from
    transplanted weights on identical batches: all 7 logged losses track."""
    tnet, jnet, params = bp_pair
    from vaeplay_tpu.train.state import TrainState, torch_adam
    from vaeplay_tpu.train.steps_bp import make_bp_train_step

    opt = torch.optim.Adam(tnet.parameters(), lr=LR)  # train_BP.py:176
    state = TrainState.create(jnet.apply, jax.tree_util.tree_map(jnp.asarray, params),
                              None, torch_adam(LR))
    jstep = make_bp_train_step(jnet)

    keys = ("loss_cx", "loss_cy", "loss_rest", "trig_loss", "param_loss",
            "pos_trig_loss", "pos_param_loss")
    t_curve = {k: [] for k in keys}
    j_curve = {k: [] for k in keys}
    rng = np.random.default_rng(11)
    for _ in range(STEPS):
        imgs, p1, p2 = _batch(rng)
        # --- reference two-pass iteration (train_BP.py:63-99)
        m1, _ = _torch_losses(tnet, imgs, p1, p2, phase=1)
        loss1 = (m1["loss_cx"] + m1["loss_cy"] + m1["loss_rest"]
                 + m1["trig_loss"] + m1["param_loss"])
        opt.zero_grad(set_to_none=False)
        loss1.backward()
        opt.step()
        m2, _ = _torch_losses(tnet, imgs, p1, p2, phase=2)
        opt.zero_grad(set_to_none=False)
        (m2["pos_trig_loss"] + m2["pos_param_loss"]).backward()
        opt.step()
        tm = {k: float(v) for k, v in {**m1, **m2}.items()}

        state, jm = jstep(state, jnp.asarray(imgs), jnp.asarray(p1),
                          jnp.asarray(p2))
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
