"""BE_font trainer CLI — rebuild of reference train_BE_font.py.

Defaults match the reference (train_BE_font.py:226-240): 64px, batch 32,
143 classes, three Adam(1e-4) optimizers (net / style_enc / disc).  The
on-the-fly kana synthesis (page crop + augmented glyph compositing) runs on
the host; all three optimization phases run in one jit program.
"""

import argparse
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.data.font_data import (
    AugmentOperator, FEDataset, ImageDatasetJson, SyntheticGlyphDataset,
    prepare_synthesis_data,
)
from vaeplay_tpu.data.prefetch import prefetch
from vaeplay_tpu.models.be_font import ComposeNet, Discriminator
from vaeplay_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from vaeplay_tpu.train.checkpoint import Checkpointer, restore_state, save_state
from vaeplay_tpu.train.metrics import accumulating, fetch_averages
from vaeplay_tpu.train.steps_be_font import create_font_state, make_be_font_train_step
from vaeplay_tpu.utils.metrics_log import MetricsLogger
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs, save_image_grid

AVG_KEYS = ("loss_edge", "loss_mask", "d_adv_real", "d_aux_real",
            "d_adv_fake", "loss_g_adv", "loss_g_aux", "loss_embed")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU BE_font (kana mask cGAN) trainer")
    parser.add_argument("--lr", type=float, dest="lr", default=1e-4)
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--epoch", type=int, dest="epochs", default=1)
    parser.add_argument("--batchsize", type=int, dest="batchsize", default=32)
    parser.add_argument("--workers", type=int, dest="workers", default=0)
    parser.add_argument("--img_size", type=int, dest="img_size", default=64)
    parser.add_argument("--iterations", type=int, dest="iterations", default=64)
    parser.add_argument("--fonts_path", type=str, dest="fonts_path", default=None,
                        help="reference ./save_folder of rendered glyphs")
    parser.add_argument("--pages_json", type=str, dest="pages_json", default=None,
                        help="reference training_data.json page list")
    parser.add_argument("--res_output", type=str, dest="res_output", default="./results")
    parser.add_argument("--model_output", type=str, dest="model_output", default="./logs")
    parser.add_argument("--viz_freq", type=int, dest="viz_freq", default=20)
    parser.add_argument("--seed", type=int, dest="seed", default=0)
    parser.add_argument("--dtype", type=str, dest="dtype", default="float32",
                        choices=("float32", "f32", "bfloat16", "bf16"),
                        help="compute dtype for forward/backward FLOPs; "
                             "master params/opt state/BN stats/losses stay f32")
    parser.add_argument("--resume", type=str, dest="resume", default=None,
                        help="run dir of a previous checkpoint to resume from")
    args = parser.parse_args(argv)

    dest_name = os.path.join("BE_font", datetime.now().strftime("%Y%m%d-%H%M%S"))
    args.res_output = os.path.join(args.res_output, dest_name)
    args.model_output = os.path.join(args.model_output, dest_name)
    makedirs(args.res_output)
    makedirs(args.model_output)
    with open(os.path.join(args.model_output, "record.txt"), "w") as f:
        for arg in vars(args):
            f.write("{:35}{:20}\n".format(arg, str(getattr(args, arg))))

    g_model = ComposeNet(in_size=args.img_size)
    d_model = Discriminator(in_size=args.img_size)
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    y = {"cls": jnp.zeros((1, 143)), "cnt_style": jnp.zeros((1, 5))}
    m2 = jnp.zeros((1, args.img_size, args.img_size, 2))
    gv = jit_init(g_model, {"params": jax.random.PRNGKey(args.seed)}, x, y,
                  method=g_model.init_all)
    dv = jit_init(d_model, {"params": jax.random.PRNGKey(args.seed + 1)}, m2, y)
    fs = create_font_state(g_model, d_model, gv, dv, args.lr)
    mesh = create_mesh()
    start_epoch = 0
    if args.resume:
        fs, tag = restore_state(args.resume, fs)
        start_epoch = tag + 1
        print(f"resumed epoch {tag} from {args.resume}")
    fs = replicate(mesh, fs)
    from vaeplay_tpu.utils.amp import resolve_dtype
    step = make_be_font_train_step(g_model, d_model, args.lr,
                                   compute_dtype=resolve_dtype(args.dtype))
    astep = accumulating(step)
    ckpt = Checkpointer(args.model_output)
    mlog = MetricsLogger(args.model_output)

    if args.fonts_path and args.pages_json:
        batches_fn = _real_data_batches(args)
    else:
        print("no --fonts_path/--pages_json; using synthetic glyph synthesis")
        ds = SyntheticGlyphDataset(data_size=args.iterations * args.batchsize,
                                   seed=args.seed)
        batches_fn = lambda epoch: ds.batches(args.batchsize, args.img_size, epoch)

    for epoch in range(start_epoch, args.epochs):
        acc, cnt = None, None
        # host kana synthesis/compositing overlaps device compute
        for i, b in enumerate(prefetch(batches_fn(epoch))):
            imgs, masks, edges, labels, styles = shard_batch(
                mesh, (b["imgs"], b["masks"], b["edges"], b["labels"], b["styles"])
            )
            fs, acc, cnt = astep(fs, acc, cnt, imgs, masks, edges, labels, styles)
            if (i + 1) % args.viz_freq == 0:
                avg = fetch_averages(acc, cnt)
                print(f"Epoch [{epoch}][{i+1}] " + " ".join(
                    f"{k}={avg[k]:.6f}" for k in AVG_KEYS))
                mlog.log(epoch * args.iterations + i + 1,
                         {k: avg[k] for k in AVG_KEYS}, epoch=epoch)
        # full state: every net's params AND optimizer state
        save_state(ckpt, epoch, fs)
        print(f"epoch {epoch} checkpoint → {ckpt.path(epoch)}")


def _real_data_batches(args):
    """Real-data path: FEDataset glyphs composited onto ImageDataset pages."""
    fe = FEDataset(args.fonts_path)
    pages = ImageDatasetJson(args.pages_json)
    augmentor = AugmentOperator()

    def gen(epoch):
        rng = np.random.default_rng((args.seed, epoch))
        order = rng.permutation(len(fe))
        for i in range(0, (len(fe) // args.batchsize) * args.batchsize, args.batchsize):
            base_img, target = pages.load(int(rng.integers(0, len(pages))))
            items = [fe.load(j) for j in order[i : i + args.batchsize]]
            imgs, masks, labels = zip(*items)
            t_imgs, t_masks, t_edges, t_styles = prepare_synthesis_data(
                base_img, target, imgs, masks, augmentor, rng)
            from PIL import Image

            def to_arr(pil, ch):
                pil = pil.resize((args.img_size, args.img_size), Image.BILINEAR)
                a = np.asarray(pil, np.float32) / 255.0
                if ch == 3 and a.ndim == 2:
                    a = np.stack([a] * 3, -1)
                if ch == 1:
                    if a.ndim == 3:
                        a = a[..., 0]
                    a = a[..., None]
                return a

            yield {
                "imgs": np.stack([to_arr(x.convert("RGB"), 3) for x in t_imgs]),
                "masks": np.stack([to_arr(x, 1) for x in t_masks]),
                "edges": np.stack([to_arr(x, 1) for x in t_edges]),
                "labels": np.asarray(labels, np.int64),
                "styles": np.asarray(t_styles, np.float32),
            }

    return gen


if __name__ == "__main__":
    main()
