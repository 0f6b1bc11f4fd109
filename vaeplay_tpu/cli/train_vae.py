"""Circle VAE-GAN trainer CLI — rebuild of reference train.py.

Flags mirror the reference vocabulary (train.py:109-123); `--gpu` is accepted
for CLI compatibility and ignored (device placement is mesh-driven).  The
per-batch work — circle rendering, target encoding, forward, all five loss
heads, and four RMSprop updates — is ONE jit-compiled XLA program, sharded
batch-parallel over every available device.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.circles import (
    CircleDataset, DiskCircleDataset, encode_targets)
from vaeplay_tpu.data.prefetch import epoch_iterator
from vaeplay_tpu.models.vae_gan import VaeGan
from vaeplay_tpu.ops.geometry import decode_circle_param, render_circle_batch
from vaeplay_tpu.parallel.mesh import (
    create_mesh, parse_mesh_arg, replicate, shard_batch, shard_params)
from vaeplay_tpu.train.checkpoint import (
    Checkpointer, make_run_dir, restore_state, save_state)
from vaeplay_tpu.train.metrics import accumulating, fetch_averages
from vaeplay_tpu.train.state import TrainState, grouped_transform, torch_rmsprop
from vaeplay_tpu.train.steps_vae import (
    make_circle_train_step, make_eval_step, make_train_step)
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.metrics_log import MetricsLogger
from vaeplay_tpu.utils.profiling import maybe_profile
from vaeplay_tpu.utils.viz import makedirs, save_image_grid

AVG_KEYS = ("loss_recon", "loss_encoder", "loss_decoder", "loss_discriminator", "loss_aux")


def build_state(args) -> tuple:
    model = VaeGan(img_size=args.img_size, z_size=args.zdim)
    x = jnp.zeros((2, args.img_size, args.img_size, 1))
    variables = jit_init(
        model,
        {"params": jax.random.PRNGKey(args.seed), "noise": jax.random.PRNGKey(args.seed + 1)}, x,
    )
    # four RMSprop(1e-4) optimizers over disjoint subsets (train.py:136-146)
    lr = args.lr
    tx = grouped_transform(
        {
            "encoder": torch_rmsprop(lr),
            "decoder": torch_rmsprop(lr),
            "discriminator": torch_rmsprop(lr),
            "param_encoder": torch_rmsprop(lr),
        },
        variables["params"],
    )
    state = TrainState.create(model.apply, variables["params"], variables["batch_stats"], tx)
    return model, state


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU circle VAE-GAN trainer")
    parser.add_argument("--epoch", type=int, dest="epochs", default=20)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=16)
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--img_size", type=int, dest="img_size", default=128)
    parser.add_argument("--zdim", type=int, dest="zdim", default=128)
    parser.add_argument("--lr", type=float, dest="lr", default=1e-4)
    parser.add_argument("--res_output", type=str, dest="res_output", default="./results")
    parser.add_argument("--model_output", type=str, dest="model_output", default="./logs")
    parser.add_argument("--viz_freq", type=int, dest="viz_freq", default=16)
    parser.add_argument("--data_size", type=int, dest="data_size", default=4096)
    parser.add_argument("--workers", type=int, dest="workers", default=4,
                        help="host loader threads for --path disk mode "
                             "(reference train.py:150 num_workers=4)")
    parser.add_argument("--path", type=str, dest="path", default=None,
                        help="pre-generated circle dir (filename-encoded "
                             "params, reference CDataset ifGen=False mode, "
                             "dataset.py:35-48); default: on-device synthesis")
    parser.add_argument("--dtype", type=str, dest="dtype", default="float32",
                        choices=("float32", "f32", "bfloat16", "bf16"),
                        help="compute dtype for forward/backward FLOPs; "
                             "master params/opt state/BN stats/losses stay f32")
    parser.add_argument("--remat", action="store_true", dest="remat",
                        help="rematerialize the forward in the backward "
                             "(jax.checkpoint): trades FLOPs for HBM "
                             "headroom at larger per-chip batches; "
                             "numerically identical to the plain step")
    parser.add_argument("--seed", type=int, dest="seed", default=0)
    parser.add_argument("--resume", type=str, dest="resume", default=None)
    parser.add_argument("--mesh", type=str, dest="mesh", default=None,
                        help="device mesh as DATAxMODEL, e.g. 4x2: batch "
                             "sharded over the data axis, large dense kernels "
                             "(and their optimizer state) tensor-sharded over "
                             "the model axis; default = all devices on data")
    parser.add_argument("--profile", type=str, dest="profile", default=None,
                        help="directory for a jax.profiler trace")
    parser.add_argument("--profile_steps", type=int, dest="profile_steps", default=5,
                        help="trace only the first N steps (device tracing "
                             "over the axon tunnel slows execution heavily)")
    args = parser.parse_args(argv)

    makedirs(args.res_output)
    run_dir = make_run_dir(args.model_output, "VAE")
    ckpt = Checkpointer(run_dir)
    mlog = MetricsLogger(run_dir)

    model, state = build_state(args)
    mesh = parse_mesh_arg(args.mesh)
    start_epoch = 0
    if args.resume:
        state, tag = restore_state(args.resume, state)
        start_epoch = tag + 1
        print(f"resumed epoch {tag} from {args.resume}")
    state = replicate(mesh, state)
    if mesh.shape["model"] > 1:
        # tensor parallelism: last-axis shard the big dense kernels and their
        # optimizer moments over "model"; GSPMD inserts the ICI collectives
        state = state.replace(params=shard_params(mesh, state.params),
                              opt_state=shard_params(mesh, state.opt_state))
        print(f"mesh data={mesh.shape['data']} model={mesh.shape['model']}: "
              "tensor-sharded dense kernels on the model axis")
    from vaeplay_tpu.utils.amp import resolve_dtype
    cdtype = resolve_dtype(args.dtype)
    if args.path:
        ds = DiskCircleDataset(args.path, args.img_size)
        assert len(ds) > 0, f"no filename-encoded circle files in {args.path}"
        print(f"disk mode: {len(ds)} pre-generated circles from {args.path}")
        step = make_train_step(model, compute_dtype=cdtype,
                               remat=args.remat)  # disk images
    else:
        ds = CircleDataset(n=args.img_size, min_radius=10,
                           data_size=args.data_size, seed=args.seed)
        step = make_circle_train_step(model, args.img_size,
                                      compute_dtype=cdtype,
                                      remat=args.remat)  # on-device render
    rng = jax.random.PRNGKey(args.seed + 2)

    eval_step = make_eval_step(model)
    astep = accumulating(step)
    profile_cm = None
    if args.profile:
        profile_cm = maybe_profile(args.profile)
        profile_cm.__enter__()
    global_it = 0
    for epoch in range(start_epoch, args.epochs):
        acc, cnt = None, None
        t0 = time.perf_counter()
        seen = 0
        for i, batch in enumerate(
            epoch_iterator(ds, args.batchsize, epoch, workers=args.workers)
        ):
            rng, sub = jax.random.split(rng)
            # metrics accumulate on device; the host only syncs at viz_freq
            if args.path:
                imgs_np, pb = batch
                targets = encode_targets(args.img_size, pb)  # host numpy
                imgs_d, targets_d = shard_batch(mesh, (imgs_np, targets))
                state, acc, cnt = astep(state, acc, cnt, imgs_d, targets_d, sub)
            else:
                pb = batch
                pb_dev = shard_batch(mesh, pb)
                state, acc, cnt = astep(state, acc, cnt, pb_dev, sub)
            seen += pb.shape[0]
            global_it += 1
            if profile_cm is not None and global_it >= args.profile_steps:
                jax.block_until_ready(acc)
                profile_cm.__exit__(None, None, None)
                profile_cm = None
                print(f"profile trace ({args.profile_steps} steps) → {args.profile}")

            if (i + 1) % args.viz_freq == 0:
                avg = fetch_averages(acc, cnt)
                dt = time.perf_counter() - t0
                print(f"epoch {epoch} it {i+1}: "
                      + " ".join(f"{k}={avg[k]:.6f}" for k in AVG_KEYS)
                      + f" | {seen/dt:.1f} img/s")
                mlog.log(int(jax.device_get(state.step)), avg, epoch=epoch,
                         images_per_sec=seen / dt)
                # comparison grid: input | reconstruction | render(decoded params)
                imgs = render_circle_batch(
                    args.img_size, jnp.asarray(pb[:, 0]), jnp.asarray(pb[:, 1]),
                    jnp.asarray(pb[:, 2]),
                )
                rng, sub = jax.random.split(rng)
                x_tilde, pred_params = eval_step(state, imgs, sub)
                dec = decode_circle_param(
                    args.img_size, pred_params[:, 0], pred_params[:, 1], pred_params[:, 2]
                )
                from_params = render_circle_batch(
                    args.img_size, dec["radius"], dec["x"], dec["y"]
                )
                grid = np.concatenate(
                    [np.asarray(imgs), np.asarray(x_tilde), np.asarray(from_params)], axis=0
                )
                save_image_grid(
                    grid, os.path.join(args.res_output, f"{epoch}_{i}.png"),
                    nrow=pb.shape[0], padding=2, pad_value=1.0,
                )
        save_state(ckpt, epoch, state)
        print(f"epoch {epoch} done; checkpoint → {ckpt.path(epoch)}")
    if profile_cm is not None:
        profile_cm.__exit__(None, None, None)


if __name__ == "__main__":
    main()
