"""BE trainer CLI — rebuild of reference train_BE.py.

Flag vocabulary matches the reference (train_BE.py:81-98); run-dir layout is
logs/BE/<timestamp>/ with a record.txt args dump (train_BE.py:100-110).  The
joint rotation/flip augmentation runs on device inside the step; with no
--path the hermetic synthetic bubble dataset is used.
"""

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp

from vaeplay_tpu.data.be_data import BEDataset, SyntheticBubbleDataset
from vaeplay_tpu.data.prefetch import epoch_iterator
from vaeplay_tpu.eval.be_eval import save_test_batch
from vaeplay_tpu.models.be import ComposeNet
from vaeplay_tpu.ops.warp import random_joint_rot_flip
from vaeplay_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from vaeplay_tpu.train.checkpoint import Checkpointer, restore_state, save_state
from vaeplay_tpu.train.metrics import accumulating, fetch_averages
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
from vaeplay_tpu.train.steps_be import make_be_eval_step, make_be_train_step
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.metrics_log import MetricsLogger
from vaeplay_tpu.utils.viz import makedirs

AVG_KEYS = ("loss_edge", "loss_mask")


def _load_backbone(path, variables):
    """Transplant a torchvision resnet50(-FPN) checkpoint into the model's
    backbone subtree(s) — the reference trains from pretrained torchvision
    weights (networks_BE.py:16, networks_BC.py:83, networks_BE_GAN.py:44);
    here the user supplies the file offline.  Returns rebuilt variables."""
    import flax

    from vaeplay_tpu.models.backbone import load_and_transplant_backbone

    params = flax.core.unfreeze(variables["params"])
    constants = flax.core.unfreeze(variables.get("constants", {}))
    n = load_and_transplant_backbone(path, params, constants)
    print(f"backbone checkpoint {path}: transplanted into {n} subtree(s)")
    out = dict(variables)
    out["params"] = params
    out["constants"] = constants
    return out


def build_state(args):
    model = ComposeNet()
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(args.seed)}, x)
    if getattr(args, "backbone_ckpt", None):
        variables = _load_backbone(args.backbone_ckpt, variables)
    tx = frozen_backbone_adam(args.lr)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx,
        constants=variables.get("constants"),
    )
    return model, state


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BE (bubble mask+edge) trainer")
    parser.add_argument("--path", type=str, dest="path", default=None)
    parser.add_argument("--lr", type=float, dest="lr", default=1e-4)
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--epoch", type=int, dest="epochs", default=1)
    parser.add_argument("--iterations", type=int, dest="iterations", default=1000)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=32)
    parser.add_argument("--workers", type=int, dest="workers", default=0)
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
    parser.add_argument("--res_output", type=str, dest="res_output", default="./results")
    parser.add_argument("--model_output", type=str, dest="model_output", default="./logs")
    parser.add_argument("--viz_freq", type=int, dest="viz_freq", default=100)
    parser.add_argument("--seed", type=int, dest="seed", default=0)
    parser.add_argument("--backbone_ckpt", type=str, dest="backbone_ckpt",
                        default=None,
                        help="torchvision resnet50 checkpoint (.pth/.pt/.npz) "
                             "to transplant into the FPN backbone — the "
                             "reference's pretrained=True (networks_BE.py:16)")
    parser.add_argument("--resume", type=str, dest="resume", default=None,
                        help="run dir of a previous checkpoint to resume from")
    parser.add_argument("--dtype", type=str, dest="dtype", default="float32",
                        choices=("float32", "f32", "bfloat16", "bf16"),
                        help="compute dtype for forward/backward FLOPs; "
                             "master params/opt state/BN stats/losses stay f32")
    args = parser.parse_args(argv)

    dest_name = os.path.join("BE", datetime.now().strftime("%Y%m%d-%H%M%S"))
    args.res_output = os.path.join(args.res_output, dest_name)
    args.model_output = os.path.join(args.model_output, dest_name)
    makedirs(args.res_output)
    makedirs(args.model_output)
    with open(os.path.join(args.model_output, "record.txt"), "w") as f:
        for arg in vars(args):
            f.write("{:35}{:20}\n".format(arg, str(getattr(args, arg))))

    if args.path:
        dset = BEDataset(args.path, (args.img_size, args.img_size))
    else:
        print("no --path given; using the synthetic bubble dataset")
        dset = SyntheticBubbleDataset(
            img_size=args.img_size, data_size=args.iterations * args.batchsize
        )

    model, state = build_state(args)
    mesh = create_mesh()
    start_epoch = 0
    if args.resume:
        state, tag = restore_state(args.resume, state)
        start_epoch = tag + 1
        print(f"resumed epoch {tag} from {args.resume}")
    state = replicate(mesh, state)
    from vaeplay_tpu.utils.amp import resolve_dtype
    step = make_be_train_step(model, compute_dtype=resolve_dtype(args.dtype))
    eval_step = make_be_eval_step(model)
    ckpt = Checkpointer(args.model_output)
    mlog = MetricsLogger(args.model_output)
    rng = jax.random.PRNGKey(args.seed + 1)

    @jax.jit
    def augment(rng, imgs, bimgs, eimgs):
        out_img, (ob, oe) = random_joint_rot_flip(rng, imgs, (bimgs, eimgs))
        return out_img, ob, oe

    astep = accumulating(step)
    for epoch in range(start_epoch, args.epochs):
        it = epoch_iterator(dset, args.batchsize, epoch, workers=args.workers)
        acc, cnt = None, None
        for i in range(args.iterations):
            try:
                batch = next(it)
            except StopIteration:
                it = epoch_iterator(dset, args.batchsize, epoch * 7919 + i,
                    workers=args.workers)
                batch = next(it)
            imgs, bimgs, eimgs = shard_batch(
                mesh, (batch["imgs"], batch["bimgs"], batch["eimgs"])
            )
            rng, sub = jax.random.split(rng)
            imgs, bimgs, eimgs = augment(sub, imgs, bimgs, eimgs)
            state, acc, cnt = astep(state, acc, cnt, imgs, bimgs, eimgs)
            if (i + 1) % args.viz_freq == 0:
                avg = fetch_averages(acc, cnt)
                print(" ".join(f"{k}={avg[k]:.6f}" for k in AVG_KEYS))
                mlog.log(epoch * args.iterations + i + 1,
                         {k: avg[k] for k in AVG_KEYS}, epoch=epoch)
                preds = eval_step(state, imgs)
                save_test_batch(imgs, preds, args.res_output, f"{epoch}_{i+1}")
        save_state(ckpt, epoch, state)
        print(f"epoch {epoch} checkpoint → {ckpt.path(epoch)}")


if __name__ == "__main__":
    main()
