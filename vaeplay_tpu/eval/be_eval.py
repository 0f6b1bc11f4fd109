"""BE inference visualization — rebuild of reference test_BE.py:26-62
(save_test_batch): input images alongside 0.5-thresholded mask/edge overlays.
"""

import os

import numpy as np

from vaeplay_tpu.utils.viz import save_image_grid


def save_test_batch(imgs, preds, res_output: str, name: str, threshold: float = 0.5):
    """imgs (B,H,W,3) in [0,1]; preds dict with sigmoid "masks"/"edges"
    (B,H,W,1).  Writes a [inputs; masks; edges] grid like the reference's
    draw_segmentation_masks panels."""
    imgs = np.asarray(imgs)
    masks = (np.asarray(preds["masks"]) > threshold).astype(np.float32)
    edges = (np.asarray(preds["edges"]) > threshold).astype(np.float32)
    b = imgs.shape[0]
    mask_rgb = np.repeat(masks, 3, axis=-1)
    edge_rgb = np.repeat(edges, 3, axis=-1)
    grid = np.concatenate([imgs, mask_rgb, edge_rgb], axis=0)
    save_image_grid(grid, os.path.join(res_output, f"{name}.png"), nrow=b)
