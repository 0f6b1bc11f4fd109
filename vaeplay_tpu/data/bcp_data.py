"""BCP dataset — rebuild of reference BCPDataset (datasets/dataset.py:511-639)
plus a synthetic emit/solid generator.

Per-sample pipeline (host): layers/masks/annotations triples; annotation
points [sx, sy, ex, ey, freq, key]; joint ±15° rotation + random offset on
image AND points, random v/h flips mirroring coords, out-of-bounds filter,
endpoint→offset conversion, key-preserving decimation to max_points
(dataset.py:546-639).  Outputs fixed-capacity (P, 6) + validity masks.
"""

import json
import os
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

from vaeplay_tpu.data.be_data import decode_layer_mask
from vaeplay_tpu.data.bp_data import SyntheticEmitDataset


def resample_points_with_constraint(
    contour: np.ndarray, max_points: int, rng: np.random.Generator
) -> np.ndarray:
    """Key-preserving random decimation (dataset.py:494-508)."""
    l = len(contour)
    if l > max_points:
        fix = contour[:, 5] >= 0.9
        rest = np.where(~fix)[0]
        budget = max_points - int(fix.sum())
        idx = rng.permutation(len(rest))[:max(budget, 0)]
        fix[rest[idx]] = True
        return contour[fix]
    return contour


def mask_bbox(mask: np.ndarray):
    """PIL Image.getbbox equivalent on a (H, W) array: (left, upper, right,
    lower) of the nonzero region with exclusive right/lower, or None."""
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max()) + 1, int(ys.max()) + 1


def random_offset(bbox, img_size: int, rng: np.random.Generator,
                  maximum=None, offset=None):
    """Random translation keeping the bbox roughly in frame — exact port of
    the reference random_offset (datasets/dataset.py:462-492)."""
    left, upper, right, lower = bbox
    right = img_size - right
    lower = img_size - lower
    if offset is not None:
        left, upper = left + offset, upper + offset
        right, lower = right + offset, lower + offset
    if maximum is not None:
        left, upper = min(left, maximum), min(upper, maximum)
        right, lower = min(right, maximum), min(lower, maximum)
    left = -left + 1
    upper = -upper + 1
    offset_x = int(rng.integers(left, right)) if left < right else 0
    offset_y = int(rng.integers(upper, lower)) if upper < lower else 0
    return offset_x, offset_y


def affine_nearest_np(img: np.ndarray, rot_rad: float, ox: float, oy: float,
                      fill: float = 0.0) -> np.ndarray:
    """Host nearest-neighbour affine warp of (H, W, C): rotate about the
    image center (w*0.5, h*0.5) by rot_rad with the point-transform matrix
    R = [[cos, -sin], [sin, cos]], then translate by (ox, oy) — the forward
    map the reference applies to annotation points (dataset.py:583-605), so
    warped pixels land exactly where transformed points do (TF.affine's
    center differs by <= half a pixel; point math is the contract here)."""
    h, w = img.shape[:2]
    cx, cy = w * 0.5, h * 0.5
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = xs - cx - ox
    dy = ys - cy - oy
    c, s = np.cos(rot_rad), np.sin(rot_rad)
    sx = c * dx + s * dy + cx   # inverse rotation
    sy = -s * dx + c * dy + cy
    xi = np.rint(sx).astype(np.int64)
    yi = np.rint(sy).astype(np.int64)
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)].copy()
    out[~inb] = fill
    return out


def augment_points_sample(
    img: np.ndarray,        # (H, W, 3) [img, bmask, emask] float
    points: np.ndarray,     # (N, 6) pixel coords
    max_points: int,
    rng: np.random.Generator,
    rotate: bool = True,
):
    """The joint affine/flip/filter pipeline on one sample — exact port of
    the reference BCPDataset.__getitem__ augmentation (dataset.py:540-639):
    the SAME rotation+offset affine is applied to the image and the
    annotation points, then shared flips, out-of-bounds point filter,
    endpoint→offset conversion, and key-preserving decimation.

    Reference quirk reproduced deliberately: the affine (rotation included)
    is applied ONLY when the random offset is nonzero — `TF.affine` and the
    point rotation both live inside `if offset_x != 0 or offset_y != 0`
    (dataset.py:575-605), so a (0, 0) offset draw skips rotation entirely.
    """
    h, w = img.shape[:2]
    points = points.astype(np.float32).copy()
    scale = 1.0 / h
    rot_deg = rng.uniform(-15, 15) if rotate else 0.0
    rot = rot_deg * np.pi / 180.0
    cx, cy = w * 0.5, h * 0.5
    bbox = mask_bbox(img[..., 0] > 0)
    ox, oy = random_offset(bbox, h, rng) if bbox is not None else (0, 0)
    if ox != 0 or oy != 0:
        img = affine_nearest_np(img, rot, float(ox), float(oy))
        if rotate:
            xs = points[:, 0:3:2] - cx
            ys = points[:, 1:4:2] - cy
            tx = xs * np.cos(rot) - ys * np.sin(rot)
            ty = xs * np.sin(rot) + ys * np.cos(rot)
            points[:, 0:3:2] = tx + cx
            points[:, 1:4:2] = ty + cy
        points[:, 0:3:2] += ox
        points[:, 1:4:2] += oy
    points[:, :4] = (points[:, :4] * scale - 0.5) / 0.5
    if rng.random() < 0.5:
        img = img[::-1].copy()
        points[:, 1:4:2] *= -1
    if rng.random() < 0.5:
        img = img[:, ::-1].copy()
        points[:, 0:3:2] *= -1
    if rotate:
        keep = (np.abs(points[:, 0]) <= 1) | (np.abs(points[:, 1]) <= 1) | \
               (np.abs(points[:, 2]) <= 1) | (np.abs(points[:, 3]) <= 1)
        points = points[keep]
    points[:, 2:4] = points[:, 2:4] - points[:, 0:2]
    points = resample_points_with_constraint(points, max_points, rng)
    return img, points


class BCPDataset:
    """Host loader for the reference layers/masks/annotations layout."""

    def __init__(self, data_path: str, img_size: int, max_points: int = 2048):
        self.max_points = max_points
        self.img_size = img_size
        self.items = []
        for cls_name in sorted(os.listdir(data_path)):
            cls_folder = os.path.join(data_path, cls_name)
            layer_path = os.path.join(cls_folder, "layers")
            if not os.path.isdir(layer_path):
                continue
            for name in sorted(os.listdir(layer_path)):
                name = name.split(".")[0]
                with open(os.path.join(cls_folder, "annotations", f"{name}.txt")) as fp:
                    anno = json.load(fp)
                self.items.append({
                    "label": int(cls_name) - 1,
                    "layer": os.path.join(layer_path, f"{name}.png"),
                    "mask": os.path.join(cls_folder, "masks", f"{name}.png"),
                    "points": np.asarray(anno["points"], np.float32),
                })

    def __len__(self):
        return len(self.items)

    def load(self, idx: int, rng: np.random.Generator):
        it = self.items[idx]
        mask = np.asarray(Image.open(it["mask"]).convert("L"), np.float32) / 255.0
        layer = np.asarray(Image.open(it["layer"]).convert("RGB"))
        bmask, emask = decode_layer_mask(layer)
        img = np.stack([mask, bmask, emask], axis=-1)
        img, pts = augment_points_sample(img, it["points"], self.max_points, rng)
        return img, it["label"], pts

    def epoch_batches(self, batch_size: int, seed: int = 0,
                      workers: int = 0) -> Iterator[dict]:
        """workers > 0 pools decode + joint augmentation on threads; each
        sample then draws from its own (seed, sample-index) child rng so
        results are deterministic and thread-order-independent (workers=0
        keeps the original single-stream draws)."""
        from vaeplay_tpu.data.prefetch import batched_loads

        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self))
        p = self.max_points
        if workers > 0:
            load = lambda j: self.load(j, np.random.default_rng((seed, int(j))))
            item_batches = batched_loads(load, order, batch_size, workers)
        else:
            stop = (len(self) // batch_size) * batch_size
            seq = (self.load(int(j), rng) for j in order[:stop])
            item_batches = ([next(seq) for _ in range(batch_size)]
                            for _ in range(stop // batch_size))
        for items in item_batches:
            imgs, labels, points, pmask = [], [], [], []
            for img, lbl, pts in items:
                buf = np.zeros((p, 6), np.float32)
                n = min(len(pts), p)
                buf[:n] = pts[:n]
                m = np.zeros((p,), np.float32)
                m[:n] = 1.0
                imgs.append(img)
                labels.append(lbl)
                points.append(buf)
                pmask.append(m)
            yield {
                "imgs": np.stack(imgs), "labels": np.asarray(labels, np.int64),
                "points": np.stack(points), "pmask": np.stack(pmask),
            }


class BCPDatasetTEST:
    """Test-time BCP loader (dataset.py:641-688): class-{2,3} `_mask2`
    bubble images + `_layer` masks stacked as [img, bmask, emask] channels
    (the reference's hardcoded extra scan of a second data root is dropped)."""

    def __init__(self, data_path: str, img_size: int):
        self.img_size = img_size
        self.items = []
        for cls_name in sorted(os.listdir(data_path)):
            if cls_name not in ("2", "3"):
                continue
            cls_folder = os.path.join(data_path, cls_name)
            for patch in sorted(os.listdir(cls_folder)):
                if any(t in patch for t in ("layer", "mask", "edge", "bubble")):
                    continue
                name, ext = patch.split(".")[:2]
                self.items.append({
                    "img": os.path.join(cls_folder, f"{name}_mask2.{ext}"),
                    "mask": os.path.join(cls_folder, f"{name}_layer.{ext}"),
                })

    def __len__(self):
        return len(self.items)

    def load(self, idx: int):
        it = self.items[idx]
        s = self.img_size
        img = np.asarray(
            Image.open(it["img"]).convert("L").resize((s, s), Image.NEAREST),
            np.float32) / 255.0
        mask = Image.open(it["mask"]).convert("RGB").resize((s, s), Image.NEAREST)
        bmask, emask = decode_layer_mask(np.asarray(mask))
        return np.stack([img, bmask, emask], axis=-1)


@dataclass
class SyntheticBCPDataset:
    """Synthetic solid/emit bubbles with per-contour-point annotations,
    reusing the emit-line generator's ellipse machinery."""

    img_size: int = 128
    data_size: int = 512
    max_points: int = 512
    seed: int = 0

    def sample_batch(self, batch_size: int, batch_seed: int = 0) -> dict:
        rng = np.random.default_rng((self.seed, batch_seed))
        emit = SyntheticEmitDataset(self.img_size, seed=self.seed)
        imgs, p1s, p2s = emit.sample_batch(batch_size, batch_seed)
        p = self.max_points
        points = np.zeros((batch_size, p, 6), np.float32)
        pmask = np.zeros((batch_size, p), np.float32)
        labels = rng.integers(0, 2, size=batch_size).astype(np.int64)
        for b in range(batch_size):
            rows = p2s[b]  # (720, 6): [trig, x, y, dx, dy, len]
            sel = np.linspace(0, len(rows) - 1, min(p, len(rows))).astype(int)
            r = rows[sel]
            n = len(r)
            points[b, :n, 0:2] = r[:, 1:3]                       # sx, sy
            points[b, :n, 2:4] = r[:, 3:5] * r[:, 5:6]           # offsets
            points[b, :n, 4] = r[:, 0]                           # freq
            points[b, :n, 5] = (np.arange(n) % 16 == 0)          # keys
            pmask[b, :n] = 1.0
        return {"imgs": imgs, "labels": labels, "points": points, "pmask": pmask}

    def epoch_batches(self, batch_size: int, seed: int = 0) -> Iterator[dict]:
        for i in range(self.data_size // batch_size):
            yield self.sample_batch(batch_size, batch_seed=seed * 10_000 + i)
