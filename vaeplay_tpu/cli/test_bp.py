"""BP inference CLI — rebuild of reference test_BP.py: predicted ellipse +
emit-line ray visualization (test_BP.py:100-213)."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
from vaeplay_tpu.eval.viz_points import draw_points, draw_rays
from vaeplay_tpu.models.bp import VALUE_WEIGHT, ComposeNet
from vaeplay_tpu.train.checkpoint import Checkpointer
from vaeplay_tpu.train.state import TrainState, torch_adam
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs, save_image_grid


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BP inference")
    parser.add_argument("--path", type=str, dest="path", default=None,
                        help="dataset root — walks every class-3 test sample "
                             "(reference test_BP.py full-dataset loop); "
                             "default: one synthetic batch")
    parser.add_argument("--model_path", type=str, dest="model_path", default=None)
    parser.add_argument("--debug", action="store_true", dest="debug")
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=4)
    parser.add_argument("--res_output", type=str, dest="res_output",
                        default="./results/bp_test")
    args = parser.parse_args(argv)
    if not args.debug and not args.model_path:
        parser.error("--model_path required unless --debug")
    makedirs(args.res_output)

    model = ComposeNet(image_size=args.img_size)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, x)
    state = TrainState.create(model.apply, variables["params"], None, torch_adam(1e-3))
    if args.model_path:
        ck = Checkpointer(args.model_path)
        restored = ck.restore(ck.latest(), template=jax.device_get({
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step}))
        state = state.replace(params=restored["params"])

    @jax.jit
    def forward(params, imgs):
        return model.apply({"params": params}, imgs, train=False)

    def render_batch(imgs, name):
        preds = forward(state.params, jnp.asarray(imgs))
        n = args.img_size
        sample = np.asarray(preds["sample_infos"])  # (B, S, 6) in [-1,1] coords
        trig = np.asarray(preds["if_triggers"]).argmax(-1).astype(bool)
        line = np.asarray(preds["line_params"])     # offsets x10, theta, len x10
        panels = []
        for i in range(imgs.shape[0]):
            base = np.asarray(imgs[i])
            px = (sample[i, :, 0] * 0.5 + 0.5) * n
            py = (sample[i, :, 1] * 0.5 + 0.5) * n
            starts = np.stack([px, py], -1)
            dirs = sample[i, :, 2:4]
            lengths = np.abs(line[i, :, 3]) / VALUE_WEIGHT * 0.5 * n
            p1 = draw_points(base, starts, color=(255, 0, 0))
            p2 = draw_rays(base, starts, dirs, lengths, trig[i])
            panels.extend([base, p1, p2])
        out = os.path.join(args.res_output, f"{name}.png")
        save_image_grid(np.stack(panels), out, nrow=3)
        print(f"wrote {out}")

    if args.path:
        # full-dataset walker over the test split (reference test_BP.py loop)
        from vaeplay_tpu.data.bp_data import BPDatasetTEST

        dset = BPDatasetTEST(args.path, args.img_size)
        if not len(dset):
            parser.error(f"no class-3 test samples under {args.path}")
        for s in range(0, len(dset), args.batchsize):
            idxs = range(s, min(s + args.batchsize, len(dset)))
            imgs = np.stack([dset.load(j) for j in idxs])
            render_batch(imgs, f"emit_{s // args.batchsize}")
    else:
        ds = SyntheticEmitDataset(img_size=args.img_size,
                                  data_size=args.batchsize)
        imgs, _, _ = ds.sample_batch(args.batchsize)
        render_batch(imgs, "emit")


if __name__ == "__main__":
    main()
