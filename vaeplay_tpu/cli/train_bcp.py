"""BCP trainer CLI — rebuild of reference train_BCP.py.

Defaults match the reference (train_BCP.py:180-197): 512px, batch 16,
<=2048 points, Adam 1e-3 for both G and D; both GAN phases fused into one
jit program per iteration.
"""

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp

from vaeplay_tpu.data.bcp_data import BCPDataset, SyntheticBCPDataset
from vaeplay_tpu.models.bcp import ComposeNet, Discriminator
from vaeplay_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from vaeplay_tpu.train.checkpoint import Checkpointer
from vaeplay_tpu.train.metrics import accumulating, fetch_averages
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.train.steps_bcp import make_bcp_train_step
from vaeplay_tpu.train.steps_be_gan import GanState
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs

AVG_KEYS = ("loss_class", "loss_frequency_one", "loss_frequency_zero",
            "loss_total_regress", "loss_key_regress", "d_adv_real",
            "d_adv_fake", "g_adv_loss")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BCP (contour point GAN) trainer")
    parser.add_argument("--path", type=str, dest="path", default=None)
    parser.add_argument("--lr", type=float, dest="lr", default=1e-3)
    parser.add_argument("--lr_disc", type=float, dest="lr_disc", default=1e-3)
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--epoch", type=int, dest="epochs", default=1)
    parser.add_argument("--iterations", type=int, dest="iterations", default=200)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=16)
    parser.add_argument("--workers", type=int, dest="workers", default=0)
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
    parser.add_argument("--max_points", type=int, dest="max_points", default=2048)
    parser.add_argument("--res_output", type=str, dest="res_output", default="./results")
    parser.add_argument("--model_output", type=str, dest="model_output", default="./logs")
    parser.add_argument("--viz_freq", type=int, dest="viz_freq", default=10)
    parser.add_argument("--seed", type=int, dest="seed", default=0)
    args = parser.parse_args(argv)

    dest_name = os.path.join("BCP", datetime.now().strftime("%Y%m%d-%H%M%S"))
    args.res_output = os.path.join(args.res_output, dest_name)
    args.model_output = os.path.join(args.model_output, dest_name)
    makedirs(args.res_output)
    makedirs(args.model_output)
    with open(os.path.join(args.model_output, "record.txt"), "w") as f:
        for arg in vars(args):
            f.write("{:35}{:20}\n".format(arg, str(getattr(args, arg))))

    g_model = ComposeNet(image_size=args.img_size, pt_size=args.max_points)
    d_model = Discriminator(image_size=args.img_size, pt_size=args.max_points)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    cnt = jnp.zeros((1, args.max_points, 2))
    counts = jnp.ones((1,), jnp.int32)
    tgt = jnp.zeros((1, args.max_points, 4))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(args.seed)}, x, cnt, counts)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(args.seed + 1)}, x, tgt)
    g = TrainState.create(g_model.apply, gv["params"], None, torch_adam(args.lr))
    d = TrainState.create(d_model.apply, dv["params"], None, torch_adam(args.lr_disc))
    mesh = create_mesh()
    gs = replicate(mesh, GanState(g=g, d=d))
    step = make_bcp_train_step(g_model, d_model)
    astep = accumulating(step)
    ckpt = Checkpointer(args.model_output)

    if args.path:
        dset = BCPDataset(args.path, args.img_size, args.max_points)
    else:
        print("no --path given; using the synthetic BCP dataset")
        dset = SyntheticBCPDataset(
            img_size=args.img_size, max_points=args.max_points,
            data_size=args.iterations * args.batchsize,
        )

    for epoch in range(args.epochs):
        it = iter(dset.epoch_batches(args.batchsize, epoch))
        acc, cnt_m = None, None
        for i in range(args.iterations):
            try:
                b = next(it)
            except StopIteration:
                it = iter(dset.epoch_batches(args.batchsize, epoch * 7919 + i))
                b = next(it)
            imgs, labels, points, pmask = shard_batch(
                mesh, (b["imgs"], b["labels"], b["points"], b["pmask"])
            )
            gs, acc, cnt_m = astep(gs, acc, cnt_m, imgs, labels, points, pmask)
            if (i + 1) % args.viz_freq == 0:
                avg = fetch_averages(acc, cnt_m)
                print(f"[epoch {epoch}] " + " ".join(
                    f"{k}={avg[k]:.6f}" for k in AVG_KEYS))
        ckpt.save(epoch, {
            "G": {"params": gs.g.params}, "D": {"params": gs.d.params},
            "step": gs.g.step,
        })
        print(f"epoch {epoch} checkpoint → {ckpt.path(epoch)}")


if __name__ == "__main__":
    main()
