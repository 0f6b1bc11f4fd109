"""BE_GAN trainer CLI — rebuild of reference train_BE_GAN.py.

Defaults match the reference (train_BE_GAN.py:189-207): 512px, batch 16,
10 epochs x 200 iterations, Adam G lr / D lr*0.1 with betas (0.5, 0.999).
Both GAN phases (D update, then G update against the updated D) run in one
jit program per iteration.
"""

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp

from vaeplay_tpu.data.be_data import BEDataset, SyntheticBubbleDataset
from vaeplay_tpu.data.prefetch import epoch_iterator
from vaeplay_tpu.eval.be_eval import save_test_batch
from vaeplay_tpu.models.be_gan import ComposeNet, Discriminator
from vaeplay_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from vaeplay_tpu.train.checkpoint import Checkpointer, restore_state, save_state
from vaeplay_tpu.train.metrics import accumulating, fetch_averages
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam, torch_adam
from vaeplay_tpu.train.steps_be_gan import GanState, make_be_gan_train_step
from vaeplay_tpu.utils.metrics_log import MetricsLogger
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs

AVG_KEYS = ("d_adv_loss", "d_type_loss", "loss_edge", "loss_mask",
            "g_adv_loss", "g_type_loss", "loss_cnt")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BE_GAN trainer")
    parser.add_argument("--path", type=str, dest="path", default=None)
    parser.add_argument("--aug_path", type=str, dest="aug_path", default=None)
    parser.add_argument("--lr", type=float, dest="lr", default=1e-4)
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--epochs", type=int, dest="epochs", default=10)
    parser.add_argument("--iterations", type=int, dest="iterations", default=200)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=16)
    parser.add_argument("--workers", type=int, dest="workers", default=0)
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
    parser.add_argument("--res_output", type=str, dest="res_output", default="./results")
    parser.add_argument("--model_output", type=str, dest="model_output", default="./logs")
    parser.add_argument("--viz_freq", type=int, dest="viz_freq", default=20)
    parser.add_argument("--seed", type=int, dest="seed", default=0)
    parser.add_argument("--backbone_ckpt", type=str, dest="backbone_ckpt",
                        default=None,
                        help="torchvision resnet50 checkpoint (.pth/.pt/.npz) "
                             "to transplant into the FPN backbone — the "
                             "reference's pretrained=True")
    parser.add_argument("--dtype", type=str, dest="dtype", default="float32",
                        choices=("float32", "f32", "bfloat16", "bf16"),
                        help="compute dtype for forward/backward FLOPs; "
                             "master params/opt state/BN stats/losses stay f32")
    parser.add_argument("--resume", type=str, dest="resume", default=None,
                        help="run dir of a previous checkpoint to resume from")
    args = parser.parse_args(argv)

    dest_name = os.path.join("BE_GAN", datetime.now().strftime("%Y%m%d-%H%M%S"))
    args.res_output = os.path.join(args.res_output, dest_name)
    args.model_output = os.path.join(args.model_output, dest_name)
    makedirs(args.res_output)
    makedirs(args.model_output)
    with open(os.path.join(args.model_output, "record.txt"), "w") as f:
        for arg in vars(args):
            f.write("{:35}{:20}\n".format(arg, str(getattr(args, arg))))

    g_model = ComposeNet()
    d_model = Discriminator(in_size=args.img_size, num_classes=4)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    m = jnp.zeros((1, args.img_size, args.img_size, 1))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(args.seed)}, x)
    if args.backbone_ckpt:
        from vaeplay_tpu.cli.train_be import _load_backbone
        gv = _load_backbone(args.backbone_ckpt, gv)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(args.seed + 1)}, x, m, m)
    g = TrainState.create(
        g_model.apply, gv["params"], gv["batch_stats"],
        # G Adam betas (0.5, 0.999) — train_BE_GAN.py:236
        frozen_backbone_adam(args.lr, (0.5, 0.999)),
        constants=gv.get("constants"),
    )
    d = TrainState.create(
        d_model.apply, dv["params"], dv["batch_stats"],
        torch_adam(args.lr * 0.1, (0.5, 0.999)),
    )
    mesh = create_mesh()
    gs = GanState(g=g, d=d)
    start_epoch = 0
    if args.resume:
        gs, tag = restore_state(args.resume, gs)
        start_epoch = tag + 1
        print(f"resumed epoch {tag} from {args.resume}")
    gs = replicate(mesh, gs)
    from vaeplay_tpu.utils.amp import resolve_dtype
    step = make_be_gan_train_step(g_model, d_model,
                                  compute_dtype=resolve_dtype(args.dtype))  # two-program split
    astep = accumulating(step, fuse=False)
    from vaeplay_tpu.train.steps_be import make_be_eval_step

    eval_step = make_be_eval_step(g_model)
    ckpt = Checkpointer(args.model_output)
    mlog = MetricsLogger(args.model_output)

    if args.path:
        from vaeplay_tpu.data.be_gan_data import BEGanDataset
        dset = BEGanDataset(args.path, args.img_size)
    else:
        print("no --path given; using the synthetic bubble dataset")
        dset = SyntheticBubbleDataset(
            img_size=args.img_size, data_size=args.iterations * args.batchsize
        )

    # optional background-synthesis aug stream: every 10 iterations swap the
    # compositing page (reference train_BE_GAN.py:98-110)
    aug_pages = None
    if args.aug_path:
        from vaeplay_tpu.data.be_gan_data import MangaPageDataset
        aug_pages = MangaPageDataset(args.aug_path)
        print(f"aug stream: {len(aug_pages)} manga pages")
    import numpy as _np
    aug_rng = _np.random.default_rng(args.seed + 7)

    for epoch in range(start_epoch, args.epochs):
        it = epoch_iterator(dset, args.batchsize, epoch, workers=args.workers)
        acc, cnt = None, None
        for i in range(args.iterations):
            if aug_pages is not None and i % 10 == 0 and hasattr(dset, "synthesis_target"):
                dset.synthesis_target = aug_pages.load(
                    int(aug_rng.integers(0, len(aug_pages))))
            try:
                batch = next(it)
            except StopIteration:
                it = epoch_iterator(dset, args.batchsize, epoch * 7919 + i,
                    workers=args.workers)
                batch = next(it)
            imgs, bimgs, eimgs, labels = shard_batch(
                mesh, (batch["imgs"], batch["bimgs"], batch["eimgs"], batch["labels"])
            )
            gs, acc, cnt = astep(gs, acc, cnt, imgs, bimgs, eimgs, labels)
            if (i + 1) % args.viz_freq == 0:
                avg = fetch_averages(acc, cnt)
                print(f"[Epoch: {epoch}] " + " ".join(
                    f"{k}={avg[k]:.6f}" for k in AVG_KEYS))
                mlog.log(epoch * args.iterations + i + 1,
                         {k: avg[k] for k in AVG_KEYS}, epoch=epoch)
                # reference grid idiom (train_BE_GAN.py:186 save_test_batch)
                preds = eval_step(gs.g, imgs)
                save_test_batch(imgs, preds, args.res_output,
                                f"{epoch}_{i + 1}_wgtm")
        # full GanState: G and D params AND both optimizer states
        save_state(ckpt, epoch, gs)
        print(f"epoch {epoch} checkpoint → {ckpt.path(epoch)}")


if __name__ == "__main__":
    main()
