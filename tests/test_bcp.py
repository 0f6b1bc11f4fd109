"""BCP family tests: shapes, detached classifier, fused GAN step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
from vaeplay_tpu.models.bcp import ComposeNet, Discriminator, eval_contours_from_masks
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.train.steps_bcp import make_bcp_train_step
from vaeplay_tpu.train.steps_be_gan import GanState
from vaeplay_tpu.utils.jitting import jit_init

IMG = 64
P = 128


@pytest.fixture(scope="module")
def bcp_state():
    # slim encoder for the fast tier (the reference 8-block dual-tower
    # depth is covered by the slow-tier trajectory gate
    # test_parity_trajectory_bcp and by test_merged_encoder_matches_dual_towers)
    g_model = ComposeNet(image_size=IMG, pt_size=P, encoder_blocks=4)
    d_model = Discriminator(image_size=IMG, pt_size=P)
    x = jnp.zeros((1, IMG, IMG, 3))
    cnt = jnp.zeros((1, P, 2))
    counts = jnp.ones((1,), jnp.int32)
    tgt = jnp.zeros((1, P, 4))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(0)}, x, cnt, counts)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(1)}, x, tgt)
    g = TrainState.create(g_model.apply, gv["params"], None, torch_adam(1e-3))
    d = TrainState.create(d_model.apply, dv["params"], None, torch_adam(1e-3))
    return g_model, d_model, GanState(g=g, d=d)


def test_bcp_forward_shapes(bcp_state):
    g_model, _, gs = bcp_state
    ds = SyntheticBCPDataset(img_size=IMG, max_points=P)
    b = ds.sample_batch(2)
    counts = jnp.sum(jnp.asarray(b["pmask"]), axis=1).astype(jnp.int32)
    preds = g_model.apply(
        {"params": gs.g.params}, jnp.asarray(b["imgs"]),
        jnp.asarray(b["points"][..., :2]), counts, train=True,
    )
    assert preds["classes"].shape == (2, 2)
    assert preds["target_pts"].shape == (2, P, 2)
    assert preds["target_frequency"].shape == (2, P)
    fr = np.asarray(preds["target_frequency"])
    assert fr.min() >= 0.0 and fr.max() <= 1.0


def test_bcp_classifier_detached_from_line_losses(bcp_state):
    """Line-predictor losses must not backprop into the classifier
    (x_cls.detach() at networks_BCP.py:296)."""
    g_model, _, gs = bcp_state
    ds = SyntheticBCPDataset(img_size=IMG, max_points=P)
    b = ds.sample_batch(1)
    counts = jnp.sum(jnp.asarray(b["pmask"]), axis=1).astype(jnp.int32)

    def line_only_loss(params):
        preds = g_model.apply(
            {"params": params}, jnp.asarray(b["imgs"]),
            jnp.asarray(b["points"][..., :2]), counts, train=True,
        )
        return jnp.sum(preds["target_pts"]) + jnp.sum(preds["target_frequency"])

    grads = jax.grad(line_only_loss)(gs.g.params)
    assert float(optax.global_norm(grads["cls_classifier"])) == 0.0
    assert float(optax.global_norm(grads["line_predictor"])) > 0.0
    # gradient still reaches the shared encoder through the gather
    assert float(optax.global_norm(grads["encoder"])) > 0.0


def test_bcp_gan_step(bcp_state):
    g_model, d_model, gs = bcp_state
    step = make_bcp_train_step(g_model, d_model)
    ds = SyntheticBCPDataset(img_size=IMG, max_points=P)
    b = ds.sample_batch(2)
    gs2, metrics = step(
        gs, jnp.asarray(b["imgs"]), jnp.asarray(b["labels"]),
        jnp.asarray(b["points"]), jnp.asarray(b["pmask"]),
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    d_before = np.asarray(jax.tree_util.tree_leaves(gs.d.params)[0])
    d_after = np.asarray(jax.tree_util.tree_leaves(gs2.d.params)[0])
    assert np.abs(d_after - d_before).max() > 0


@pytest.mark.slow  # heavy full-model run; fast-tier budget (round-5 VERDICT item 6)
def test_shared_vjp_step_matches_two_pass(bcp_state):
    """The fused step linearizes G once (jax.vjp) and reuses the forward for
    both the D phase's fake targets and the G phase's pullback — the
    reference recomputes an identical forward (train_BCP.py:71,96, G params
    unchanged in between).  Assert identical updated params vs the literal
    two-forward form.  SGD(1.0) states make the comparison a direct gradient
    check (see test_style_gan.py for the rationale)."""
    import optax

    from vaeplay_tpu.models.bcp import VALUE_WEIGHT
    from vaeplay_tpu.ops import losses as L

    g_model, d_model, gs_adam = bcp_state
    sgd = optax.sgd(1.0)
    gs = GanState(
        g=TrainState.create(g_model.apply, gs_adam.g.params, None, sgd),
        d=TrainState.create(d_model.apply, gs_adam.d.params, None, sgd),
    )
    ds = SyntheticBCPDataset(img_size=IMG, max_points=P)
    b = ds.sample_batch(2)
    args = (jnp.asarray(b["imgs"]), jnp.asarray(b["labels"]),
            jnp.asarray(b["points"]), jnp.asarray(b["pmask"]))

    step = make_bcp_train_step(g_model, d_model)
    got, _ = step(gs, *args)

    @jax.jit
    def literal_step(gs, imgs, labels, points, pmask):
        g, d = gs.g, gs.d
        counts = jnp.sum(pmask, axis=1).astype(jnp.int32)
        contours = points[..., :2] * pmask[..., None]
        valid3 = pmask[..., None]

        def g_fwd(g_params):
            return g_model.apply({"params": g_params}, imgs, contours,
                                 counts, train=True)

        preds = g_fwd(g.params)
        fake_targets = jax.lax.stop_gradient(jnp.concatenate(
            [contours * VALUE_WEIGHT, preds["target_pts"]], axis=-1) * valid3)
        real_targets = points[..., :4] * VALUE_WEIGHT * valid3

        def d_loss_fn(d_params):
            r = d_model.apply({"params": d_params}, imgs, real_targets,
                              train=True)
            f = d_model.apply({"params": d_params}, imgs, fake_targets,
                              train=True)
            return 0.5 * (jnp.mean(L.bce(r, jnp.ones_like(r), eps=1e-12))
                          + jnp.mean(L.bce(f, jnp.zeros_like(f), eps=1e-12)))

        d = d.apply_gradients(jax.grad(d_loss_fn)(d.params))

        def g_loss_fn(g_params):
            preds = g_fwd(g_params)                       # fresh 2nd forward
            loss_class = jnp.mean(
                L.softmax_cross_entropy(preds["classes"], labels))
            freq_pred = preds["target_frequency"]
            ft = (points[..., 4] > 0.1) & (pmask > 0)
            nt = (points[..., 4] <= 0.1) & (pmask > 0)
            loss_f1 = L.masked_mean(jnp.abs(freq_pred - 1.0), ft)
            loss_f0 = jnp.where(
                jnp.sum(nt) > 0,
                jnp.sum(jnp.abs(freq_pred) * nt) / jnp.maximum(jnp.sum(ft), 1),
                0.0)
            gt_off = points[..., 2:4] * VALUE_WEIGHT
            diff = jnp.abs(preds["target_pts"] - gt_off)
            loss_total = L.masked_mean(diff, pmask[..., None])
            key = (points[..., 5] > 0.9) & (pmask > 0)
            loss_key = (jnp.sum(jnp.sum(diff, axis=-1) * key)
                        / jnp.maximum(jnp.sum(key), 1))
            fake = jnp.concatenate(
                [contours * VALUE_WEIGHT, preds["target_pts"]], axis=-1
            ) * valid3
            adv = d_model.apply({"params": d.params}, imgs, fake, train=True)
            g_adv = jnp.mean(L.bce(adv, jnp.ones_like(adv), eps=1e-12))
            return (loss_class + (loss_f1 + loss_f0) * 4.0
                    + loss_total * 10.0 + loss_key * 6.0 + g_adv)

        g = g.apply_gradients(jax.grad(g_loss_fn)(g.params))
        return GanState(g=g, d=d)

    want = literal_step(gs, *args)
    for name, a, b_ in (("g", got.g.params, want.g.params),
                        ("d", got.d.params, want.d.params)):
        for (ka, va), (kb, vb) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b_)):
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), rtol=2e-5, atol=2e-6,
                err_msg=f"{name}:{jax.tree_util.keystr(ka)}")


def test_eval_contour_extraction():
    ds = SyntheticBCPDataset(img_size=IMG, max_points=P)
    b = ds.sample_batch(2)
    pts, counts = eval_contours_from_masks(b["imgs"], P)
    assert pts.shape == (2, P, 2)
    assert counts.max() > 0
    assert np.abs(pts).max() <= 1.0 + 1e-6


def test_joint_augmentation_correspondence():
    """The BCP augmentation must apply the SAME affine to the image and the
    annotation points (reference dataset.py:546-620): augment a rendered
    ellipse whose annotation points lie on its contour, re-extract the contour
    from the augmented image, and assert every augmented point still lies on
    it (within nearest-warp + trace discretization)."""
    from vaeplay_tpu.data.bcp_data import augment_points_sample
    from vaeplay_tpu.ops.contour import find_contour

    h = w = 96
    ys, xs = np.mgrid[0:h, 0:w]
    mask = ((((xs - 48.0) / 30.0) ** 2 + ((ys - 44.0) / 22.0) ** 2) <= 1.0)
    img = np.stack([mask, mask, mask], axis=-1).astype(np.float32)
    cnt = find_contour(mask.astype(np.float32))          # (N, 2) [x, y]
    pts = np.zeros((len(cnt), 6), np.float32)
    pts[:, 0:2] = cnt
    pts[:, 2:4] = cnt                                     # ex, ey = sx, sy
    pts[:, 5] = 1.0                                       # all key points

    hit = 0
    for seed in range(8):
        rng = np.random.default_rng(seed)
        aug_img, aug_pts = augment_points_sample(img.copy(), pts.copy(),
                                                 max_points=4096, rng=rng)
        assert len(aug_pts) > 0
        new_cnt = find_contour(aug_img[..., 0])
        if len(new_cnt) == 0:
            continue
        # augmented points are normalized to [-1, 1]; back to pixels
        px = (aug_pts[:, 0] * 0.5 + 0.5) * h
        py = (aug_pts[:, 1] * 0.5 + 0.5) * h
        d = np.hypot(px[:, None] - new_cnt[None, :, 0],
                     py[:, None] - new_cnt[None, :, 1]).min(axis=1)
        # nearest-neighbour warp + marching-squares discretization: ~2px
        assert np.quantile(d, 0.95) <= 2.5, (seed, np.quantile(d, 0.95))
        assert d.mean() <= 1.5, (seed, d.mean())
        hit += 1
    assert hit >= 6  # nearly all seeds must exercise a nonzero-offset affine


def test_augmentation_uses_translation():
    """The random offset must actually translate the image (round-1 bug:
    points moved, image did not)."""
    from vaeplay_tpu.data.bcp_data import augment_points_sample

    h = w = 64
    ys, xs = np.mgrid[0:h, 0:w]
    blob = (((xs - 32.0) ** 2 + (ys - 32.0) ** 2) <= 9.0 ** 2)
    img = np.stack([blob] * 3, axis=-1).astype(np.float32)
    pts = np.zeros((4, 6), np.float32)
    pts[:, 0:2] = [[32, 23], [41, 32], [32, 41], [23, 32]]
    pts[:, 2:4] = pts[:, 0:2]
    moved = 0
    for seed in range(6):
        rng = np.random.default_rng(seed)
        aug_img, aug_pts = augment_points_sample(img.copy(), pts.copy(),
                                                 max_points=64, rng=rng,
                                                 rotate=False)
        ys2, xs2 = np.nonzero(aug_img[..., 0])
        cx, cy = xs2.mean(), ys2.mean()
        if abs(cx - 32.0) > 2 or abs(cy - 32.0) > 2:
            moved += 1
            # the point centroid must track the blob centroid
            px = (aug_pts[:, 0] * 0.5 + 0.5) * h
            py = (aug_pts[:, 1] * 0.5 + 0.5) * h
            assert abs(abs(px.mean() - w / 2) - abs(cx - w / 2)) < 2.0
            assert abs(abs(py.mean() - h / 2) - abs(cy - h / 2)) < 2.0
    assert moved >= 3


def test_merged_encoder_matches_dual_towers():
    """The block-diagonal merged ContentEndoer must be math-identical to the
    dual 64-ch towers: transplant the dual init via merge_encoder_params and
    compare outputs AND per-kernel gradients (the zero cross-tower blocks
    contribute exact zeros, so only conv accumulation order differs)."""
    from vaeplay_tpu.models.bcp import ContentEndoer, merge_encoder_params

    blocks = 3
    dual = ContentEndoer(blocks=blocks, merged=False)
    merged = ContentEndoer(blocks=blocks, merged=True)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 32, 32, 5)).astype(np.float32))
    dv = jit_init(dual, {"params": jax.random.PRNGKey(7)}, x)
    mp = merge_encoder_params(dv["params"], blocks=blocks)
    # layout sanity: converted tree typechecks against a fresh merged init
    mv = jit_init(merged, {"params": jax.random.PRNGKey(8)}, x)
    jax.tree_util.tree_map(lambda a, b: None, mv["params"], mp)

    out_d = dual.apply({"params": dv["params"]}, x, train=True)
    out_m = merged.apply({"params": mp}, x, train=True)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_d),
                               rtol=2e-5, atol=2e-5)

    def loss(mod, params):
        return jnp.sum(jnp.square(mod.apply({"params": params}, x, train=True)))

    gd = jax.grad(lambda p: loss(dual, p))(dv["params"])
    gm = jax.grad(lambda p: loss(merged, p))(mp)
    gm_as_dual = {}
    for i in range(blocks):
        a, b = {}, {}
        for c, bias_b in (("c0", False), ("c1", True), ("c2", False)):
            m = gm[f"m{i}"]
            a[c] = {"conv": {"kernel": m[f"{c}_kernel_a"],
                             "bias": m[f"{c}_bias_a"]}}
            b[c] = {"conv": {"kernel": m[f"{c}_kernel_b"]}}
            if bias_b:
                b[c]["conv"]["bias"] = m[f"{c}_bias_b"]
        gm_as_dual[f"a{i}"], gm_as_dual[f"b{i}"] = a, b
    for (pa, ga), (pb, gb) in zip(
            jax.tree_util.tree_leaves_with_path(gd),
            jax.tree_util.tree_leaves_with_path(gm_as_dual)):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"{pa} vs {pb}")
