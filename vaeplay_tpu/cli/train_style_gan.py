"""Style_GAN trainer CLI — rebuild of reference train_Style_GAN.py.

Defaults match the reference (train_Style_GAN.py:287-302): 256px, z=512,
batch 32, 2 epochs x 1000 iterations, 2 classes, three Adam(1e-4) optimizers.
The E/G/latent-cycle/D phases all run in one jit program per iteration.
"""

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
from vaeplay_tpu.data.prefetch import epoch_iterator
from vaeplay_tpu.models.style_gan import Discriminator, Generator, StyleEncoder
from vaeplay_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from vaeplay_tpu.train.checkpoint import Checkpointer, restore_state, save_state
from vaeplay_tpu.train.metrics import accumulating, fetch_averages
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.train.steps_style_gan import StyleGanState, make_style_gan_train_step
from vaeplay_tpu.utils.metrics_log import MetricsLogger
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs, save_image_grid

AVG_KEYS = ("g_rec_kl_loss", "g_rec_d_loss", "g_rec_pixel_loss",
            "g_gen_d_loss", "loss_latent", "d_real_loss", "d_fake_loss")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU Style_GAN trainer")
    parser.add_argument("--path", type=str, dest="path", default=None)
    parser.add_argument("--lr", type=float, dest="lr", default=1e-4)
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--epochs", type=int, dest="epochs", default=2)
    parser.add_argument("--iterations", type=int, dest="iterations", default=1000)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=32)
    parser.add_argument("--workers", type=int, dest="workers", default=0)
    parser.add_argument("--img_size", type=int, dest="img_size", default=256)
    parser.add_argument("--z_dim", type=int, dest="z_dim", default=512)
    parser.add_argument("--num_of_classes", type=int, dest="num_of_classes", default=2)
    parser.add_argument("--res_output", type=str, dest="res_output", default="./results")
    parser.add_argument("--model_output", type=str, dest="model_output", default="./logs")
    parser.add_argument("--viz_freq", type=int, dest="viz_freq", default=50)
    parser.add_argument("--seed", type=int, dest="seed", default=0)
    parser.add_argument("--dtype", type=str, dest="dtype", default="float32",
                        choices=("float32", "f32", "bfloat16", "bf16"),
                        help="compute dtype for forward/backward FLOPs; "
                             "master params/opt state/BN stats/losses stay f32")
    parser.add_argument("--resume", type=str, dest="resume", default=None,
                        help="run dir of a previous checkpoint to resume from")
    parser.add_argument("--label_bucketing", dest="label_bucketing",
                        default=True, action=argparse.BooleanOptionalAction,
                        help="sort each batch by label and run each gated-conv "
                             "branch only on its sub-batch (exact math, ~40-50%% "
                             "fewer G conv FLOPs; single-device, 2-class only)")
    args = parser.parse_args(argv)

    dest_name = os.path.join("Style_GAN", datetime.now().strftime("%Y%m%d-%H%M%S"))
    args.res_output = os.path.join(args.res_output, dest_name)
    args.model_output = os.path.join(args.model_output, dest_name)
    makedirs(args.res_output)
    makedirs(args.model_output)
    with open(os.path.join(args.model_output, "record.txt"), "w") as f:
        for arg in vars(args):
            f.write("{:35}{:20}\n".format(arg, str(getattr(args, arg))))

    e_model = StyleEncoder(z_dim=args.z_dim, image_size=args.img_size)
    g_model = Generator(image_size=args.img_size, z_dim=args.z_dim)
    d_model = Discriminator(image_size=args.img_size,
                            num_classes=args.num_of_classes)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    z = jnp.zeros((1, args.z_dim))
    y0 = jnp.zeros((1,), jnp.int32)
    ev = jit_init(e_model, {"params": jax.random.PRNGKey(args.seed)}, x)
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(args.seed + 1)}, x, z, y0)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(args.seed + 2)}, x, x)
    ss = StyleGanState(
        e=TrainState.create(e_model.apply, ev["params"], None, torch_adam(args.lr)),
        g=TrainState.create(g_model.apply, gv["params"], None, torch_adam(args.lr)),
        d=TrainState.create(d_model.apply, dv["params"], None, torch_adam(args.lr)),
    )
    mesh = create_mesh()
    start_epoch = 0
    if args.resume:
        ss, tag = restore_state(args.resume, ss)
        start_epoch = tag + 1
        print(f"resumed epoch {tag} from {args.resume}")
    ss = replicate(mesh, ss)
    from vaeplay_tpu.utils.amp import resolve_dtype
    step = make_style_gan_train_step(e_model, g_model, d_model, args.z_dim,
                                     compute_dtype=resolve_dtype(args.dtype))
    # label bucketing: sub-batch slicing on the batch axis is incompatible
    # with a data-sharded mesh (it would cross shard boundaries), and the
    # gate formula is binary — restrict to 1 device / 2 classes.
    bucketing = (args.label_bucketing and args.num_of_classes == 2
                 and mesh.devices.size == 1)
    bucket_pad = max(1, args.batchsize // 4)
    _asteps = {}

    def astep_for(split):
        # one accumulating program per (k0p, k1p) bucket; buckets are padded
        # to multiples of batchsize/4 so only a handful ever compile
        if split not in _asteps:
            if split is None:
                _asteps[split] = accumulating(step)
            else:
                _asteps[split] = accumulating(
                    lambda st, xt, xc, lb, rng: step(st, xt, xc, lb, rng,
                                                     split))
        return _asteps[split]
    ckpt = Checkpointer(args.model_output)
    mlog = MetricsLogger(args.model_output)
    rng = jax.random.PRNGKey(args.seed + 3)

    if args.path:
        from vaeplay_tpu.data.be_gan_data import BEGanStyleDataset
        dset = BEGanStyleDataset(args.path, args.img_size, select_list=(2, 3))
    else:
        print("no --path given; using the synthetic bubble dataset")
        dset = SyntheticBubbleDataset(
            img_size=args.img_size, data_size=args.iterations * args.batchsize)

    for epoch in range(start_epoch, args.epochs):
        it = epoch_iterator(dset, args.batchsize, epoch, workers=args.workers)
        acc, cnt = None, None
        for i in range(args.iterations):
            try:
                b = next(it)
            except StopIteration:
                it = epoch_iterator(dset, args.batchsize, epoch * 7919 + i,
                    workers=args.workers)
                b = next(it)
            x_target = b["imgs"]
            x_content = np.repeat(b["bimgs"], 3, axis=-1)
            labels = (b["labels"] % args.num_of_classes).astype(np.int64)
            split = None
            if bucketing:
                from vaeplay_tpu.train.steps_style_gan import sort_batch_by_label
                (x_target, x_content), labels, split = sort_batch_by_label(
                    labels, x_target, x_content, pad=bucket_pad)
            x_target, x_content, labels = shard_batch(
                mesh, (x_target, x_content, labels))
            rng, sub = jax.random.split(rng)
            ss, acc, cnt = astep_for(split)(ss, acc, cnt, x_target, x_content,
                                            labels, sub)
            if (i + 1) % args.viz_freq == 0:
                avg = fetch_averages(acc, cnt)
                print(" ".join(f"{k}={avg[k]:.6f}" for k in AVG_KEYS))
                mlog.log(epoch * args.iterations + i + 1,
                         {k: avg[k] for k in AVG_KEYS}, epoch=epoch)
        # full state: every net's params AND optimizer state
        save_state(ckpt, epoch, ss)
        print(f"epoch {epoch} checkpoint → {ckpt.path(epoch)}")


if __name__ == "__main__":
    main()
