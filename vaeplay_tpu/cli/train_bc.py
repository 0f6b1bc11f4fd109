"""BC trainer CLI — rebuild of reference train_BC.py.

Defaults match the reference (train_BC.py:90-103): 256px, batch 32, 20
epochs, <=256 contour points, Adam 1e-4 + StepLR(10, 0.5); checkpoints only
from epoch 10 on (train_BC.py:134)."""

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import optax

from vaeplay_tpu.data.bc_data import BCDataset, SyntheticBCDataset
from vaeplay_tpu.data.prefetch import epoch_iterator
from vaeplay_tpu.models.bc import ComposeNet
from vaeplay_tpu.parallel.mesh import (
    parse_mesh_arg, replicate, shard_batch, shard_params)
from vaeplay_tpu.train.checkpoint import Checkpointer, restore_state, save_state
from vaeplay_tpu.train.metrics import accumulating, fetch_averages
from vaeplay_tpu.train.state import TrainState, path_labeled_transform
from vaeplay_tpu.train.steps_bc import (
    BridgeTracer, make_bc_mask_step, make_bc_train_step)
from vaeplay_tpu.utils.metrics_log import MetricsLogger
from vaeplay_tpu.utils.jitting import jit_init, supports_host_callback
from vaeplay_tpu.utils.viz import makedirs

AVG_KEYS = ("loss_edge", "loss_mask", "loss_regress")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BC (contour refine) trainer")
    parser.add_argument("--path", type=str, dest="path", default=None)
    parser.add_argument("--lr", type=float, dest="lr", default=1e-4)
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--epoch", type=int, dest="epochs", default=20)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=32)
    parser.add_argument("--workers", type=int, dest="workers", default=0)
    parser.add_argument("--img_size", type=int, dest="img_size", default=256)
    parser.add_argument("--max_points", type=int, dest="max_points", default=256)
    parser.add_argument("--res_output", type=str, dest="res_output", default="./results")
    parser.add_argument("--model_output", type=str, dest="model_output", default="./logs")
    parser.add_argument("--viz_freq", type=int, dest="viz_freq", default=10)
    parser.add_argument("--iterations", type=int, dest="iterations", default=64,
                        help="iterations per epoch for the synthetic dataset")
    parser.add_argument("--refine_dtype", type=str, dest="refine_dtype",
                        default="bfloat16", choices=("float32", "bfloat16"),
                        help="dtype of the RefineNet FC kernels + their Adam "
                             "state; bfloat16 is the single-chip working "
                             "point for the reference's 256-point capacity "
                             "(545M-param fc0, networks_BC.py:25,165-176)")
    parser.add_argument("--bridge_stride", type=int, dest="bridge_stride",
                        default=4,
                        help="subsample factor for the external-contour "
                             "bridge's mask transfer (1 = full resolution)")
    parser.add_argument("--bridge", type=str, dest="bridge", default="overlap",
                        choices=("overlap", "sync"),
                        help="overlap: trace batch i+1's contours (one-step-"
                             "stale masks) while batch i's train step runs on "
                             "device; sync: exact reference semantics, one "
                             "blocking host round-trip per step")
    parser.add_argument("--dtype", type=str, dest="dtype", default="float32",
                        choices=("float32", "f32", "bfloat16", "bf16"),
                        help="compute dtype for backbone/head conv FLOPs "
                             "(independent of --refine_dtype); master "
                             "params/opt state/BN stats/losses stay f32")
    parser.add_argument("--mesh", type=str, dest="mesh", default=None,
                        help="device mesh as DATAxMODEL, e.g. 4x2: batch on "
                             "data; the 545M-param RefineNet FC kernel (and "
                             "its Adam state) tensor-shards over model — the "
                             "multi-chip alternative to --refine_dtype bf16 "
                             "for the 256-pt capacity")
    parser.add_argument("--seed", type=int, dest="seed", default=0)
    parser.add_argument("--backbone_ckpt", type=str, dest="backbone_ckpt",
                        default=None,
                        help="torchvision resnet50 checkpoint (.pth/.pt/.npz) "
                             "to transplant into the FPN backbone — the "
                             "reference's pretrained=True")
    parser.add_argument("--resume", type=str, dest="resume", default=None,
                        help="run dir of a previous checkpoint to resume from")
    args = parser.parse_args(argv)

    dest_name = os.path.join("BC", datetime.now().strftime("%Y%m%d-%H%M%S"))
    args.res_output = os.path.join(args.res_output, dest_name)
    args.model_output = os.path.join(args.model_output, dest_name)
    makedirs(args.res_output)
    makedirs(args.model_output)
    with open(os.path.join(args.model_output, "record.txt"), "w") as f:
        for arg in vars(args):
            f.write("{:35}{:20}\n".format(arg, str(getattr(args, arg))))

    model = ComposeNet(max_points=args.max_points,
                       refine_fc_dtype=args.refine_dtype)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(args.seed)}, x)
    if args.backbone_ckpt:
        from vaeplay_tpu.cli.train_be import _load_backbone
        variables = _load_backbone(args.backbone_ckpt, variables)

    if args.path:
        dset = BCDataset(args.path, (args.img_size, args.img_size),
                         max_points=args.max_points)
        iters_per_epoch = max(len(dset) // args.batchsize, 1)
    else:
        print("no --path given; using the synthetic BC dataset")
        dset = SyntheticBCDataset(
            img_size=args.img_size, max_points=args.max_points,
            data_size=args.iterations * args.batchsize,
        )
        iters_per_epoch = args.iterations

    # Adam + StepLR(10, 0.5) per epoch, frozen backbone stem/layer1
    def lr_schedule(step):
        epoch = step // iters_per_epoch
        return args.lr * (0.5 ** (epoch // 10))

    def label(path):
        parts = [str(p) for p in path]
        if "body" in parts:
            i = parts.index("body")
            nxt = parts[i + 1] if i + 1 < len(parts) else ""
            if nxt == "conv1" or nxt.startswith("layer1_"):
                return "frozen"
        return "train"

    tx = path_labeled_transform(
        label, {"train": optax.adam(lr_schedule), "frozen": optax.set_to_zero()},
        variables["params"],
    )
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx,
        constants=variables.get("constants"),
    )
    mesh = parse_mesh_arg(args.mesh)
    start_epoch = 0
    if args.resume:
        state, tag = restore_state(args.resume, state)
        start_epoch = tag + 1
        print(f"resumed epoch {tag} from {args.resume}")
    state = replicate(mesh, state)
    if mesh.shape["model"] > 1:
        # tensor parallelism: the RefineNet FC kernels (fc0 is 545M params,
        # networks_BC.py:165-176) and their Adam moments shard on "model"
        state = state.replace(params=shard_params(mesh, state.params),
                              opt_state=shard_params(mesh, state.opt_state))
        print(f"mesh data={mesh.shape['data']} model={mesh.shape['model']}: "
              "refine FC tensor-sharded on the model axis")
    n_devices = mesh.devices.size
    external = not supports_host_callback() or n_devices > 1
    if external:
        # pure_callback in an SPMD program runs on device 0 only ({maximal
        # device=0} sharding) and deadlocks the other devices' collectives —
        # any multi-device mesh must use the external-contour bridge
        print("using the two-program external-contour bridge"
              + (f" (required for the {n_devices}-device mesh)"
                 if supports_host_callback() else
                 " (host callbacks unsupported on this runtime)"))
    from vaeplay_tpu.utils.amp import resolve_dtype
    cdtype = resolve_dtype(args.dtype)
    step = make_bc_train_step(model, max_points=args.max_points,
                              external_contours=external,
                              compute_dtype=cdtype)
    stride = max(args.bridge_stride, 1)
    mask_step = (make_bc_mask_step(model, stride=stride, compute_dtype=cdtype)
                 if external else None)
    astep = accumulating(step)
    ckpt = Checkpointer(args.model_output)
    mlog = MetricsLogger(args.model_output)
    tracer = BridgeTracer(args.img_size, stride, args.max_points)

    def trace_and_train(state, acc, cnt, tensors, fut):
        """Join the (overlapped) host contour trace and dispatch the train
        program for its batch."""
        pts, counts = fut.result()
        pts_d, counts_d = shard_batch(mesh, (pts, counts))
        full = (tensors[0], pts_d, counts_d) + tensors[1:]
        return astep(state, acc, cnt, *full)

    for epoch in range(start_epoch, args.epochs):
        acc, cnt = None, None
        pending = None  # (tensors, trace future) awaiting its train dispatch
        for i, b in enumerate(
            epoch_iterator(dset, args.batchsize, epoch, workers=args.workers)
        ):
            tensors = shard_batch(mesh, (
                b["imgs"], b["bimgs"], b["eimgs"], b["tgt_pts"],
                b["tgt_mask"], b["key_pts"], b["key_mask"],
            ))
            if external:
                # dispatch stage A for THIS batch first so its sync + trace
                # overlap the previous batch's train program on device
                fut = tracer.submit(mask_step(state, tensors[0]))
                if args.bridge == "overlap":
                    if pending is not None:
                        state, acc, cnt = trace_and_train(
                            state, acc, cnt, *pending)
                    pending = (tensors, fut)
                else:
                    state, acc, cnt = trace_and_train(
                        state, acc, cnt, tensors, fut)
            else:
                state, acc, cnt = astep(state, acc, cnt, *tensors)
            if (i + 1) % args.viz_freq == 0 and cnt is not None:
                avg = fetch_averages(acc, cnt)
                print(f"epoch[{epoch}] " + " ".join(
                    f"{k}={avg[k]:.6f}" for k in AVG_KEYS))
                mlog.log(epoch * args.iterations + i + 1,
                         {k: avg[k] for k in AVG_KEYS}, epoch=epoch)
        if pending is not None:  # flush the overlap pipeline at epoch end
            state, acc, cnt = trace_and_train(state, acc, cnt, *pending)
        if epoch >= 10 or args.epochs <= 10:  # reference gates at epoch 10
            save_state(ckpt, epoch, state)
            print(f"epoch {epoch} checkpoint → {ckpt.path(epoch)}")


if __name__ == "__main__":
    main()
