"""BP trainer CLI — rebuild of reference train_BP.py.

Defaults match the reference (train_BP.py:131-145): 512px, batch 8, 1 epoch x
500 iterations, Adam 1e-3 with StepLR(2, 0.1) (implemented as a step-count
schedule inside the jit step — two optimizer passes per iteration).
"""

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import optax

from vaeplay_tpu.data.bp_data import BPDataset, SyntheticEmitDataset
from vaeplay_tpu.data.prefetch import epoch_iterator
from vaeplay_tpu.models.bp import ComposeNet
from vaeplay_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from vaeplay_tpu.train.checkpoint import Checkpointer, restore_state, save_state
from vaeplay_tpu.train.metrics import accumulating, fetch_averages
from vaeplay_tpu.train.state import TrainState
from vaeplay_tpu.train.steps_bp import make_bp_train_step
from vaeplay_tpu.utils.metrics_log import MetricsLogger
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs

AVG_KEYS = ("loss_cx", "loss_cy", "loss_rest", "trig_loss", "param_loss")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BP (ellipse + emit line) trainer")
    parser.add_argument("--path", type=str, dest="path", default=None)
    parser.add_argument("--lr", type=float, dest="lr", default=1e-3)
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--epoch", type=int, dest="epochs", default=1)
    parser.add_argument("--iterations", type=int, dest="iterations", default=500)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=8)
    parser.add_argument("--workers", type=int, dest="workers", default=0)
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
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
    args = parser.parse_args(argv)

    dest_name = os.path.join("BP", datetime.now().strftime("%Y%m%d-%H%M%S"))
    args.res_output = os.path.join(args.res_output, dest_name)
    args.model_output = os.path.join(args.model_output, dest_name)
    makedirs(args.res_output)
    makedirs(args.model_output)
    with open(os.path.join(args.model_output, "record.txt"), "w") as f:
        for arg in vars(args):
            f.write("{:35}{:20}\n".format(arg, str(getattr(args, arg))))

    model = ComposeNet(image_size=args.img_size)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(args.seed)}, x)

    # StepLR(2, 0.1) per epoch; state.step advances twice per iteration
    steps_per_epoch = 2 * args.iterations
    def lr_schedule(step):
        epoch = step // steps_per_epoch
        return args.lr * (0.1 ** (epoch // 2))

    tx = optax.adam(lr_schedule)
    state = TrainState.create(model.apply, variables["params"], None, tx)
    mesh = create_mesh()
    start_epoch = 0
    if args.resume:
        state, tag = restore_state(args.resume, state)
        start_epoch = tag + 1
        print(f"resumed epoch {tag} from {args.resume}")
    state = replicate(mesh, state)
    from vaeplay_tpu.utils.amp import resolve_dtype
    step = make_bp_train_step(model, compute_dtype=resolve_dtype(args.dtype))
    astep = accumulating(step)
    ckpt = Checkpointer(args.model_output)
    mlog = MetricsLogger(args.model_output)

    if args.path:
        dset = BPDataset(args.path, args.img_size)
    else:
        print("no --path given; using the synthetic emit-line dataset")
        dset = SyntheticEmitDataset(
            img_size=args.img_size, data_size=args.iterations * args.batchsize
        )

    for epoch in range(start_epoch, args.epochs):
        it = epoch_iterator(dset, args.batchsize, epoch, workers=args.workers)
        acc, cnt = None, None
        for i in range(args.iterations):
            try:
                imgs, p1, p2 = next(it)
            except StopIteration:
                it = epoch_iterator(dset, args.batchsize, epoch * 7919 + i,
                    workers=args.workers)
                imgs, p1, p2 = next(it)
            imgs, p1, p2 = shard_batch(mesh, (imgs, p1, p2))
            state, acc, cnt = astep(state, acc, cnt, imgs, p1, p2)
            if (i + 1) % args.viz_freq == 0:
                avg = fetch_averages(acc, cnt)
                print(f"[epoch {epoch}] " + " ".join(
                    f"{k}={avg[k]:.6f}" for k in AVG_KEYS))
                mlog.log(epoch * args.iterations + i + 1,
                         {k: avg[k] for k in AVG_KEYS}, epoch=epoch)
        save_state(ckpt, epoch, state)
        print(f"epoch {epoch} checkpoint → {ckpt.path(epoch)}")


if __name__ == "__main__":
    main()
