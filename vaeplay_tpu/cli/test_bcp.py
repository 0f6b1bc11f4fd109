"""BCP inference CLI — rebuild of reference test_BCP.py: eval-path contour
extraction from channel 1 + predicted point offsets visualization."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
from vaeplay_tpu.eval.viz_points import draw_points
from vaeplay_tpu.models.bcp import VALUE_WEIGHT, ComposeNet, eval_contours_from_masks
from vaeplay_tpu.train.checkpoint import Checkpointer
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs, save_image_grid


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BCP inference")
    parser.add_argument("--path", type=str, dest="path", default=None,
                        help="dataset root — walks every class-{2,3} test "
                             "sample (reference test_BCP.py full-dataset "
                             "loop); default: one synthetic batch")
    parser.add_argument("--model_path", type=str, dest="model_path", default=None)
    parser.add_argument("--debug", action="store_true", dest="debug")
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
    parser.add_argument("--max_points", type=int, dest="max_points", default=2048)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=4)
    parser.add_argument("--res_output", type=str, dest="res_output",
                        default="./results/bcp_test")
    args = parser.parse_args(argv)
    if not args.debug and not args.model_path:
        parser.error("--model_path required unless --debug")
    makedirs(args.res_output)

    model = ComposeNet(image_size=args.img_size, pt_size=args.max_points)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    cnt0 = jnp.zeros((1, args.max_points, 2))
    cn0 = jnp.ones((1,), jnp.int32)
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, x, cnt0, cn0)
    state = TrainState.create(model.apply, variables["params"], None, torch_adam(1e-3))
    if args.model_path:
        ck = Checkpointer(args.model_path)
        restored = ck.restore(ck.latest())
        g = restored.get("g") or restored["G"]  # new uniform / legacy layout
        state = state.replace(params=g["params"])

    @jax.jit
    def forward(params, imgs, contours, counts):
        return model.apply({"params": params}, imgs, contours, counts, train=False)

    def render_batch(imgs, name):
        # eval path: contours traced from input ch 1 (networks_BCP.py:277-289)
        pts, counts = eval_contours_from_masks(imgs, args.max_points)
        preds = forward(state.params, jnp.asarray(imgs),
                        jnp.asarray(pts), jnp.asarray(counts))
        n = args.img_size
        offs = np.asarray(preds["target_pts"]) / VALUE_WEIGHT
        freq = np.asarray(preds["target_frequency"])
        panels = []
        for i in range(imgs.shape[0]):
            base = np.asarray(imgs[i])
            valid = np.arange(args.max_points) < counts[i]
            px = (pts[i, :, 0] * 0.5 + 0.5) * n
            py = (pts[i, :, 1] * 0.5 + 0.5) * n
            p1 = draw_points(base, np.stack([px, py], -1), color=(255, 0, 0),
                             valid=valid)
            ex = ((pts[i, :, 0] + offs[i, :, 0]) * 0.5 + 0.5) * n
            ey = ((pts[i, :, 1] + offs[i, :, 1]) * 0.5 + 0.5) * n
            p2 = draw_points(base, np.stack([ex, ey], -1), color=(0, 255, 0),
                             valid=valid & (freq[i] > 0.5))
            panels.extend([base, p1, p2])
        out = os.path.join(args.res_output, f"{name}.png")
        save_image_grid(np.stack(panels), out, nrow=3)
        print(f"wrote {out}")

    if args.path:
        # full-dataset walker over the test split (reference test_BCP.py loop)
        from vaeplay_tpu.data.bcp_data import BCPDatasetTEST

        dset = BCPDatasetTEST(args.path, args.img_size)
        if not len(dset):
            parser.error(f"no class-2/3 test samples under {args.path}")
        for s in range(0, len(dset), args.batchsize):
            idxs = range(s, min(s + args.batchsize, len(dset)))
            render_batch(np.stack([dset.load(j) for j in idxs]),
                         f"points_{s // args.batchsize}")
    else:
        ds = SyntheticBCPDataset(img_size=args.img_size,
                                 max_points=args.max_points,
                                 data_size=args.batchsize)
        render_batch(ds.sample_batch(args.batchsize)["imgs"], "points")


if __name__ == "__main__":
    main()
