"""BE inference CLI — rebuild of reference test_BE.py.

Loads an orbax checkpoint (or builds an untrained net with --debug,
test_BE.py:71-75), runs batched eval, writes threshold-overlay grids.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.be_data import BEDataset, SyntheticBubbleDataset
from vaeplay_tpu.eval.be_eval import save_test_batch
from vaeplay_tpu.models.be import ComposeNet
from vaeplay_tpu.train.checkpoint import Checkpointer
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
from vaeplay_tpu.train.steps_be import make_be_eval_step
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs


def load_be_state(model_path: str = None, img_size: int = 512, seed: int = 0):
    model = ComposeNet()
    x = jnp.zeros((1, img_size, img_size, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(seed)}, x)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"],
        frozen_backbone_adam(1e-4), constants=variables.get("constants"),
    )
    if model_path:
        ck = Checkpointer(os.path.dirname(model_path) or model_path)
        tag = (os.path.basename(model_path)
               if os.path.basename(model_path).isdigit() else ck.latest())
        restored = ck.restore(int(tag), template=jax.device_get({
            "params": state.params, "batch_stats": state.batch_stats,
            "constants": state.constants, "opt_state": state.opt_state,
            "step": state.step,
        }))
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            constants=restored.get("constants", state.constants),
        )
    return model, state


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BE inference")
    parser.add_argument("--path", type=str, dest="path", default=None)
    parser.add_argument("--model_path", type=str, dest="model_path", default=None)
    parser.add_argument("--debug", action="store_true", dest="debug")
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=8)
    parser.add_argument("--res_output", type=str, dest="res_output", default="./results/be_test")
    args = parser.parse_args(argv)

    if not args.debug and not args.model_path:
        parser.error("--model_path required unless --debug")
    makedirs(args.res_output)
    model, state = load_be_state(None if args.debug else args.model_path,
                                 args.img_size)
    eval_step = make_be_eval_step(model)

    if args.path:
        dset = BEDataset(args.path, (args.img_size, args.img_size), if_test=True)
        batches = ({"imgs": np.stack([dset.load(j)[0] for j in range(i, min(i + args.batchsize, len(dset)))])}
                   for i in range(0, len(dset), args.batchsize))
    else:
        ds = SyntheticBubbleDataset(img_size=args.img_size, data_size=args.batchsize * 2)
        batches = ds.epoch_batches(args.batchsize)

    for i, batch in enumerate(batches):
        imgs = jnp.asarray(batch["imgs"])
        preds = eval_step(state, imgs)
        save_test_batch(imgs, preds, args.res_output, f"test_{i}")
        print(f"batch {i} → {args.res_output}/test_{i}.png")


if __name__ == "__main__":
    main()
