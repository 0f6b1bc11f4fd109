"""BC dataset — rebuild of reference BCDataset (datasets/dataset.py:200-275)
plus a synthetic variant built on the bubble generator.

Host-side preprocessing mirrors the reference: the (resized, white-cleared,
padded) content mask's largest contour is traced once up front; the full
contour is decimated to max_points and an RDP(epsilon=4) pass extracts the
key contour (dataset.py:242-254).  Targets ship as fixed-capacity padded
arrays + validity masks.
"""

import os
from dataclasses import dataclass, field
from typing import Iterator, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

from vaeplay_tpu.data.be_data import SyntheticBubbleDataset, decode_layer_mask
from vaeplay_tpu.ops.contour import find_contour, rdp_simplify, resample_points

MAX_KEY_POINTS = 64


def contour_targets_from_mask(
    bimg01: np.ndarray, padding: int = 1, max_points: int = 256,
    max_key_points: int = MAX_KEY_POINTS,
):
    """mask (H, W) in [0,1] → padded contour + key-contour targets.

    Follows dataset.py:242-254: pad, trace (the reference traces the raw
    0/255 mask at level 0.8; values here are 0/1 which the tracer handles
    identically after binarization), decimate, RDP."""
    padded = np.pad(bimg01 * 255.0, ((padding, padding), (padding, padding)))
    contour = find_contour(padded.astype(np.float32), level=0.8)
    key = rdp_simplify(contour, epsilon=4.0) if len(contour) else contour
    contour = resample_points(contour, max_points=max_points)
    pts = np.zeros((max_points, 2), np.float32)
    kpts = np.zeros((max_key_points, 2), np.float32)
    n = min(len(contour), max_points)
    k = min(len(key), max_key_points)
    if n:
        pts[:n] = contour[:n]
    if k:
        kpts[:k] = key[:k]
    return pts, n, kpts, k


class BCDataset:
    """Host loader for the reference's `<name>_edge/_mask/_mask_edge` triples
    (the model input is the `_edge` image, dataset.py:224-227)."""

    def __init__(self, data_path: str, img_size: Tuple[int, int],
                 padding: int = 1, max_points: int = 256, if_test: bool = False,
                 debug: int = -1):
        """debug=N truncates the scan to the first N samples — the
        reference's quick-iteration switch (dataset.py:228-233)."""
        self.img_size = img_size
        self.max_points = max_points
        self.padding = padding
        self.if_test = if_test
        self.imgs, self.bimgs, self.eimgs = [], [], []
        done = False
        for cls_name in sorted(os.listdir(data_path)):
            if done:
                break
            cls_folder = os.path.join(data_path, cls_name)
            if not os.path.isdir(cls_folder):
                continue
            for patch in sorted(os.listdir(cls_folder)):
                if debug > 0 and len(self.imgs) >= debug:
                    done = True
                    break
                if any(t in patch for t in ("mask", "edge", "bubble")):
                    continue
                name, ext = patch.split(".")[:2]
                self.imgs.append(os.path.join(cls_folder, f"{name}_edge.{ext}"))
                self.bimgs.append(os.path.join(cls_folder, f"{name}_mask.{ext}"))
                self.eimgs.append(os.path.join(cls_folder, f"{name}_mask_edge.{ext}"))

    def __len__(self):
        return len(self.imgs)

    def load(self, idx: int):
        w, h = self.img_size
        img = np.asarray(
            Image.open(self.imgs[idx]).convert("RGB").resize((w, h), Image.NEAREST),
            np.float32) / 255.0
        def mask01(path):
            m = np.asarray(
                Image.open(path).convert("RGB").resize((w, h), Image.NEAREST))
            b, _ = decode_layer_mask(m)
            return b
        bimg = mask01(self.bimgs[idx])
        eimg = mask01(self.eimgs[idx])
        pts, n, kpts, k = contour_targets_from_mask(
            bimg, self.padding, self.max_points)
        return img, bimg[..., None], eimg[..., None], pts, n, kpts, k

    def epoch_batches(self, batch_size: int, seed: int = 0,
                      workers: int = 0) -> Iterator[dict]:
        """workers > 0 pools the per-sample decode + contour precompute
        (reference DataLoader(num_workers) equivalent, train_BC.py)."""
        from vaeplay_tpu.data.prefetch import batched_loads

        order = np.random.default_rng(seed).permutation(len(self))
        for items in batched_loads(self.load, order, batch_size, workers):
            imgs, bimgs, eimgs, pts, ns, kpts, ks = zip(*items)
            mp = self.max_points
            yield {
                "imgs": np.stack(imgs), "bimgs": np.stack(bimgs),
                "eimgs": np.stack(eimgs),
                "tgt_pts": np.stack(pts),
                "tgt_mask": (np.arange(mp)[None, :] < np.asarray(ns)[:, None]).astype(np.float32),
                "key_pts": np.stack(kpts),
                "key_mask": (np.arange(MAX_KEY_POINTS)[None, :] < np.asarray(ks)[:, None]).astype(np.float32),
            }


@dataclass
class SyntheticBCDataset:
    """Synthetic bubbles + contour targets computed with the same host
    pipeline the real loader uses."""

    img_size: int = 128
    data_size: int = 512
    max_points: int = 256
    padding: int = 1
    seed: int = 0
    _bubbles: SyntheticBubbleDataset = field(init=False)

    def __post_init__(self):
        self._bubbles = SyntheticBubbleDataset(
            img_size=self.img_size, data_size=self.data_size, seed=self.seed
        )

    def sample_batch(self, batch_size: int, batch_seed: int = 0) -> dict:
        b = self._bubbles.sample_batch(batch_size, batch_seed)
        mp = self.max_points
        pts = np.zeros((batch_size, mp, 2), np.float32)
        kpts = np.zeros((batch_size, MAX_KEY_POINTS, 2), np.float32)
        ns = np.zeros((batch_size,), np.int32)
        ks = np.zeros((batch_size,), np.int32)
        for i in range(batch_size):
            pts[i], ns[i], kpts[i], ks[i] = contour_targets_from_mask(
                b["bimgs"][i, :, :, 0], self.padding, mp)
        return {
            "imgs": b["imgs"], "bimgs": b["bimgs"], "eimgs": b["eimgs"],
            "tgt_pts": pts,
            "tgt_mask": (np.arange(mp)[None, :] < ns[:, None]).astype(np.float32),
            "key_pts": kpts,
            "key_mask": (np.arange(MAX_KEY_POINTS)[None, :] < ks[:, None]).astype(np.float32),
        }

    def epoch_batches(self, batch_size: int, seed: int = 0) -> Iterator[dict]:
        for i in range(self.data_size // batch_size):
            yield self.sample_batch(batch_size, batch_seed=seed * 10_000 + i)
