"""Dataset visual smoke-checks — rebuild of reference test_2_dataset.py:
renders batches (images/masks/contours) from every dataset family to PNGs for
eyeballing (test_2_dataset.py:49-156).  Uses the synthetic variants by
default so it runs hermetically."""

import argparse
import os

import numpy as np

from vaeplay_tpu.data.bc_data import SyntheticBCDataset
from vaeplay_tpu.data.bcp_data import SyntheticBCPDataset
from vaeplay_tpu.data.be_data import SyntheticBubbleDataset
from vaeplay_tpu.data.bp_data import SyntheticEmitDataset
from vaeplay_tpu.data.circles import CircleDataset
from vaeplay_tpu.data.font_data import SyntheticGlyphDataset
from vaeplay_tpu.eval.viz_points import draw_points
from vaeplay_tpu.ops.geometry import render_circle_batch
from vaeplay_tpu.utils.viz import makedirs, save_image_grid


def main(argv=None):
    parser = argparse.ArgumentParser(description="dataset visual smoke-checks")
    parser.add_argument("--out", type=str, default="./tests_viz")
    parser.add_argument("--img_size", type=int, default=128)
    parser.add_argument("--batchsize", type=int, default=8)
    args = parser.parse_args(argv)
    makedirs(args.out)
    n, bs = args.img_size, args.batchsize

    # circles
    import jax.numpy as jnp
    cds = CircleDataset(n=n, data_size=bs)
    pb = next(cds.epoch_batches(bs))
    circles = np.asarray(render_circle_batch(
        n, jnp.asarray(pb[:, 0]), jnp.asarray(pb[:, 1]), jnp.asarray(pb[:, 2])))
    save_image_grid(np.repeat(circles, 3, -1), os.path.join(args.out, "circles.png"), nrow=bs)

    # bubbles (BE)
    be = SyntheticBubbleDataset(img_size=n).sample_batch(bs)
    save_image_grid(np.concatenate([
        be["imgs"], np.repeat(be["bimgs"], 3, -1), np.repeat(be["eimgs"], 3, -1)
    ]), os.path.join(args.out, "be.png"), nrow=bs)

    # BC contours
    bc = SyntheticBCDataset(img_size=n, max_points=128).sample_batch(bs)
    panels = [draw_points(bc["imgs"][i], bc["tgt_pts"][i], (255, 0, 0),
                          valid=bc["tgt_mask"][i] > 0) for i in range(bs)]
    save_image_grid(np.stack(panels), os.path.join(args.out, "bc.png"), nrow=bs)

    # BP emit lines
    imgs, p1, p2 = SyntheticEmitDataset(img_size=n).sample_batch(bs)
    save_image_grid(imgs, os.path.join(args.out, "bp.png"), nrow=bs)

    # BCP points
    bcp = SyntheticBCPDataset(img_size=n, max_points=256).sample_batch(bs)
    panels = []
    for i in range(bs):
        px = (bcp["points"][i, :, 0] * 0.5 + 0.5) * n
        py = (bcp["points"][i, :, 1] * 0.5 + 0.5) * n
        panels.append(draw_points(bcp["imgs"][i], np.stack([px, py], -1),
                                  (255, 0, 0), valid=bcp["pmask"][i] > 0))
    save_image_grid(np.stack(panels), os.path.join(args.out, "bcp.png"), nrow=bs)

    # font synthesis
    fb = next(SyntheticGlyphDataset(data_size=bs).batches(bs, n))
    save_image_grid(np.concatenate([
        fb["imgs"], np.repeat(fb["masks"], 3, -1), np.repeat(fb["edges"], 3, -1)
    ]), os.path.join(args.out, "font.png"), nrow=bs)

    print(f"wrote dataset smoke-check grids to {args.out}/")


if __name__ == "__main__":
    main()
