"""BE_font inference CLI — rebuild of reference test_BE_font.py: batched eval
grids with both conditioning paths (label-embedded and self-encoded style)."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.font_data import SyntheticGlyphDataset
from vaeplay_tpu.models.be_font import ComposeNet
from vaeplay_tpu.train.checkpoint import Checkpointer
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs, save_image_grid


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BE_font inference")
    parser.add_argument("--path", type=str, dest="path", default=None,
                        help="kana crop folder — walks every image with the "
                             "self-encoded style path (reference "
                             "test_BE_font.py KanaImageDataset loop); "
                             "default: one synthetic batch")
    parser.add_argument("--model_path", type=str, dest="model_path", default=None)
    parser.add_argument("--debug", action="store_true", dest="debug")
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--img_size", type=int, dest="img_size", default=64)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=8)
    parser.add_argument("--res_output", type=str, dest="res_output",
                        default="./results/be_font_test")
    args = parser.parse_args(argv)
    if not args.debug and not args.model_path:
        parser.error("--model_path required unless --debug")
    makedirs(args.res_output)

    model = ComposeNet(in_size=args.img_size)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    y0 = {"cls": jnp.zeros((1, 143)), "cnt_style": jnp.zeros((1, 5))}
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, x, y0,
                         method=model.init_all)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if args.model_path:
        ck = Checkpointer(args.model_path)
        restored = ck.restore(ck.latest())
        g = restored.get("g") or restored["net"]  # new uniform / legacy layout
        params = g["params"]
        batch_stats = g["batch_stats"]

    @jax.jit
    def forward(params, batch_stats, imgs, y_cls, y_style, use_y):
        y = {"cls": y_cls, "cnt_style": y_style} if use_y else None
        return model.apply({"params": params, "batch_stats": batch_stats},
                           imgs, y=y, train=False)

    def sig3_np(t):
        return np.repeat(np.asarray(jax.nn.sigmoid(t)), 3, axis=-1)

    if args.path:
        # full-folder walker, self-encoded style only (reference
        # test_BE_font.py:74-101 — `net(tensor_kana_imgs)` with no y)
        from PIL import Image

        from vaeplay_tpu.data.font_data import KanaImageDataset

        dset = KanaImageDataset(args.path)
        if not len(dset):
            parser.error(f"no images under {args.path}")
        fwd_self = jax.jit(lambda p, s, i: model.apply(
            {"params": p, "batch_stats": s}, i, y=None, train=False))
        for st in range(0, len(dset), args.batchsize):
            idxs = range(st, min(st + args.batchsize, len(dset)))
            arrs = []
            for j in idxs:
                im = dset.load(j).convert("RGB").resize(
                    (args.img_size, args.img_size), Image.NEAREST)
                arrs.append(np.asarray(im, np.float32) / 255.0)
            imgs = jnp.asarray(np.stack(arrs))
            preds = fwd_self(params, batch_stats, imgs)
            grid = np.concatenate([
                np.asarray(imgs), sig3_np(preds["masks"]),
                sig3_np(preds["edges"]),
            ], axis=0)
            name = f"test_{st // args.batchsize}"
            save_image_grid(grid, os.path.join(args.res_output, f"{name}.png"),
                            nrow=imgs.shape[0])
            print(f"wrote {args.res_output}/{name}.png")
        return

    ds = SyntheticGlyphDataset(data_size=args.batchsize)
    b = next(ds.batches(args.batchsize, args.img_size))
    imgs = jnp.asarray(b["imgs"])
    onehot = jax.nn.one_hot(jnp.asarray(b["labels"]), 143)
    styles = jnp.asarray(b["styles"])
    preds_y = jax.jit(lambda p, s, i: model.apply(
        {"params": p, "batch_stats": s}, i,
        y={"cls": onehot, "cnt_style": styles}, train=False))(params, batch_stats, imgs)
    preds_self = jax.jit(lambda p, s, i: model.apply(
        {"params": p, "batch_stats": s}, i, y=None, train=False))(params, batch_stats, imgs)

    def sig3(t):
        return np.repeat(np.asarray(jax.nn.sigmoid(t)), 3, axis=-1)

    grid = np.concatenate([
        np.asarray(imgs),
        np.repeat(b["masks"], 3, axis=-1),
        sig3(preds_y["masks"]), sig3(preds_self["masks"]),
        np.repeat(b["edges"], 3, axis=-1),
        sig3(preds_y["edges"]), sig3(preds_self["edges"]),
    ], axis=0)
    save_image_grid(grid, os.path.join(args.res_output, "font.png"),
                    nrow=imgs.shape[0])
    print(f"wrote {args.res_output}/font.png")


if __name__ == "__main__":
    main()
