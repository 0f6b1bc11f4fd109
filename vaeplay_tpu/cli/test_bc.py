"""BC inference CLI — rebuild of reference test_BC.py: mask/edge grids plus
contour + refined-point visualization (test_BC.py:35-85)."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bc_data import SyntheticBCDataset
from vaeplay_tpu.eval.viz_points import draw_points
from vaeplay_tpu.models.bc import ComposeNet
from vaeplay_tpu.ops.contour import batch_find_contours
from vaeplay_tpu.train.checkpoint import Checkpointer
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
from vaeplay_tpu.train.steps_bc import make_bc_mask_step, unpack_mask_bits
from vaeplay_tpu.utils.jitting import jit_init, supports_host_callback
from vaeplay_tpu.utils.viz import makedirs, save_image_grid


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BC inference")
    parser.add_argument("--path", type=str, dest="path", default=None)
    parser.add_argument("--model_path", type=str, dest="model_path", default=None)
    parser.add_argument("--debug", action="store_true", dest="debug")
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--img_size", type=int, dest="img_size", default=256)
    parser.add_argument("--max_points", type=int, dest="max_points", default=256)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=8)
    parser.add_argument("--res_output", type=str, dest="res_output",
                        default="./results/bc_test")
    args = parser.parse_args(argv)
    if not args.debug and not args.model_path:
        parser.error("--model_path required unless --debug")
    makedirs(args.res_output)

    model = ComposeNet(max_points=args.max_points)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, x)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"],
        frozen_backbone_adam(1e-4), constants=variables.get("constants"))
    if args.model_path:
        ck = Checkpointer(args.model_path)
        restored = ck.restore(ck.latest(), template=jax.device_get({
            "params": state.params, "batch_stats": state.batch_stats,
            "constants": state.constants, "opt_state": state.opt_state,
            "step": state.step}))
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])

    external = not supports_host_callback()
    mask_step = make_bc_mask_step(model)

    @jax.jit
    def full_forward(variables, imgs, contours):
        return model.apply(variables, imgs, train=False, contours=contours)

    def predict_batch(imgs):
        imgs = jnp.asarray(imgs)
        if external:
            masks = unpack_mask_bits(mask_step(state, imgs), args.img_size + 2)
            pts, counts_ = batch_find_contours(masks, args.max_points)
            contours = (jnp.asarray(pts), jnp.asarray(counts_))
        else:
            contours = None
        return full_forward(state.variables(), imgs, contours)

    def render_batch(imgs, name, preds=None):
        imgs = jnp.asarray(imgs)
        if preds is None:
            preds = predict_batch(imgs)
        panels = []
        cnts = np.asarray(preds["contours"])
        regs = np.asarray(preds["contour_regressions"])
        counts = np.asarray(preds["contour_counts"])
        for i in range(imgs.shape[0]):
            valid = np.arange(args.max_points) < counts[i]
            base = np.asarray(imgs[i])
            p1 = draw_points(base, cnts[i], color=(255, 0, 0), valid=valid)
            refined = cnts[i] + regs[i]
            p2 = draw_points(base, refined, color=(0, 255, 0), valid=valid)
            panels.extend([base, p1, p2])
        out = os.path.join(args.res_output, f"{name}.png")
        save_image_grid(np.stack(panels), out, nrow=3)
        print(f"wrote {out}")

    if args.path:
        # full-dataset walker over the test split (reference test_BC.py loop).
        # On the external bridge the mask→trace→refine stages are software-
        # pipelined across batches (eval/serve.pipeline_bc_batches): the host
        # trace + grid render of batch i-1 overlap batch i's device work.
        from vaeplay_tpu.data.bc_data import BCDataset

        dset = BCDataset(args.path, (args.img_size, args.img_size),
                         max_points=args.max_points, if_test=True)
        if not len(dset):
            parser.error(f"no test samples under {args.path}")

        def batch_iter():
            for s in range(0, len(dset), args.batchsize):
                idxs = range(s, min(s + args.batchsize, len(dset)))
                yield (np.stack([dset.load(j)[0] for j in idxs]),
                       f"contours_{s // args.batchsize}")

        if external:
            from vaeplay_tpu.eval.serve import pipeline_bc_batches
            from vaeplay_tpu.train.steps_bc import BridgeTracer

            tracer = BridgeTracer(args.img_size, 1, args.max_points)

            def dispatch_mask(batch):
                return mask_step(state, jnp.asarray(batch[0]))

            def dispatch_refine(batch, pts, counts):
                return full_forward(state.variables(), jnp.asarray(batch[0]),
                                    (jnp.asarray(pts), jnp.asarray(counts)))

            for (imgs, name), preds in pipeline_bc_batches(
                    dispatch_mask, tracer.submit, dispatch_refine, batch_iter()):
                render_batch(imgs, name, preds=preds)
        else:
            for imgs, name in batch_iter():
                render_batch(imgs, name)
    else:
        ds = SyntheticBCDataset(img_size=args.img_size,
                                max_points=args.max_points,
                                data_size=args.batchsize)
        render_batch(ds.sample_batch(args.batchsize)["imgs"], "contours")


if __name__ == "__main__":
    main()
