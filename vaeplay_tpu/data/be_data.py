"""BE dataset family — rebuild of reference BEDataset/BTransform
(datasets/dataset.py:105-199) plus a hermetic synthetic generator.

Design split (TPU-first):
  * Host side: directory scan, PIL decode, NEAREST resize, `_layer` mask
    decode (white→black; ch0 = content mask, ch1 = edge mask,
    dataset.py:185-191).
  * Device side: the joint random rotation/flip augmentation runs batched
    inside the train step (ops.warp.random_joint_rot_flip) instead of
    per-sample on CPU workers.

`SyntheticBubbleDataset` procedurally renders speech-bubble-like ellipses with
content/edge masks — the hermetic fixture used by tests and benchmarks (the
reference repo assumes a private manga dataset on disk).
"""

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def decode_layer_mask(mask_rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """White pixels → black, then ch0 = content mask, ch1 = edge mask
    (dataset.py:185-191).  Input uint8 (H, W, 3); returns float32 (H, W) pairs
    scaled to [0, 1]."""
    m = mask_rgb.copy()
    bg = (m[:, :, 0] == 255) & (m[:, :, 1] == 255) & (m[:, :, 2] == 255)
    m[bg] = 0
    return m[:, :, 0].astype(np.float32) / 255.0, m[:, :, 1].astype(np.float32) / 255.0


class BEDataset:
    """Folder scanner matching the reference layout: class dirs {1,2,3} for
    train / "test" for test; image files paired with `<name>_layer.<ext>`
    masks (dataset.py:155-175)."""

    def __init__(self, data_path: str, img_size: Tuple[int, int], if_test: bool = False):
        self.img_size = img_size  # (w, h)
        self.if_test = if_test
        self.imgs: List[str] = []
        self.masks: List[str] = []
        self.labels: List[int] = []
        wanted = ["test"] if if_test else ["1", "2", "3"]
        for cls_name in sorted(os.listdir(data_path)):
            if cls_name not in wanted:
                continue
            cls_folder = os.path.join(data_path, cls_name)
            for patch in sorted(os.listdir(cls_folder)):
                if any(tag in patch for tag in ("layer", "mask", "edge", "bubble")):
                    continue
                name, ext = patch.split(".")[:2]
                self.imgs.append(os.path.join(cls_folder, f"{name}.{ext}"))
                if not if_test:
                    self.masks.append(os.path.join(cls_folder, f"{name}_layer.{ext}"))
                    self.labels.append(int(cls_name))

    def __len__(self) -> int:
        return len(self.imgs)

    def load(self, idx: int):
        """Returns (img (H,W,3) float32, bimg (H,W,1), eimg (H,W,1), label)."""
        w, h = self.img_size
        img = Image.open(self.imgs[idx]).convert("RGB").resize((w, h), Image.NEAREST)
        img = np.asarray(img, dtype=np.float32) / 255.0
        if self.if_test:
            return img, None, None, None
        mask = Image.open(self.masks[idx]).convert("RGB").resize((w, h), Image.NEAREST)
        bimg, eimg = decode_layer_mask(np.asarray(mask))
        return img, bimg[..., None], eimg[..., None], self.labels[idx]

    def epoch_batches(self, batch_size: int, seed: int = 0, drop_remainder: bool = True,
                      workers: int = 0) -> Iterator[dict]:
        """workers > 0 parallelizes the per-sample PIL decode on a thread
        pool (the reference's DataLoader(num_workers=...) equivalent,
        train_BE.py:115-121); batch contents are identical either way."""
        from vaeplay_tpu.data.prefetch import batched_loads

        order = np.random.default_rng(seed).permutation(len(self))
        for items in batched_loads(self.load, order, batch_size, workers,
                                   drop_remainder):
            imgs, bimgs, eimgs, labels = zip(*items)
            yield {
                "imgs": np.stack(imgs),
                "bimgs": np.stack(bimgs),
                "eimgs": np.stack(eimgs),
                "labels": np.asarray(labels, np.int64),
            }


@dataclass
class SyntheticBubbleDataset:
    """Procedural speech-bubble batches: white page, dark elliptical bubble
    interiors (content mask) with a ring boundary (edge mask).  Hermetic
    fixture standing in for the reference's private manga crops."""

    img_size: int = 128
    data_size: int = 1024
    seed: int = 0

    def sample_batch(self, batch_size: int, batch_seed: int = 0) -> dict:
        rng = np.random.default_rng((self.seed, batch_seed))
        n = self.img_size
        yy, xx = np.mgrid[0:n, 0:n].astype(np.float32)
        imgs = np.ones((batch_size, n, n, 3), np.float32)
        bimgs = np.zeros((batch_size, n, n, 1), np.float32)
        eimgs = np.zeros((batch_size, n, n, 1), np.float32)
        labels = rng.integers(1, 4, size=batch_size)
        for i in range(batch_size):
            cx, cy = rng.uniform(0.3 * n, 0.7 * n, size=2)
            rx, ry = rng.uniform(0.15 * n, 0.3 * n, size=2)
            d = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2
            inside = d <= 1.0
            ring = (d <= 1.0) & (d >= 0.75)
            imgs[i][inside] = rng.uniform(0.0, 0.4)
            imgs[i][ring] = 0.0
            bimgs[i, :, :, 0] = inside.astype(np.float32)
            eimgs[i, :, :, 0] = ring.astype(np.float32)
        return {
            "imgs": imgs, "bimgs": bimgs, "eimgs": eimgs,
            "labels": labels.astype(np.int64),
        }

    def epoch_batches(self, batch_size: int, seed: int = 0) -> Iterator[dict]:
        for b in range(self.data_size // batch_size):
            yield self.sample_batch(batch_size, batch_seed=seed * 10_000 + b)


def sample_bubble_params(img_size: int, batch_size: int, seed: int = 0,
                         batch_seed: int = 0):
    """The parametric form of `SyntheticBubbleDataset.sample_batch`: the same
    rng stream, but returning (params (B, 5) [cx, cy, rx, ry, gray] float32,
    labels (B,) int64) instead of rasterized images.  Rasterize on DEVICE with
    `render_bubble_batch` — a batch is then a ~20-byte-per-sample host→device
    transfer instead of ~1.5 MB, which removes the tunnel-upload bottleneck
    from sustained training runs (the circle VAE family's data-on-device
    design, applied to the bubble families)."""
    import numpy as np

    rng = np.random.default_rng((seed, batch_seed))
    labels = rng.integers(1, 4, size=batch_size)
    params = np.zeros((batch_size, 5), np.float32)
    for i in range(batch_size):
        cx, cy = rng.uniform(0.3 * img_size, 0.7 * img_size, size=2)
        rx, ry = rng.uniform(0.15 * img_size, 0.3 * img_size, size=2)
        params[i] = (cx, cy, rx, ry, rng.uniform(0.0, 0.4))
    return params, labels.astype(np.int64)


def render_bubble_batch(img_size: int, params):
    """jax-side rasterizer matching `SyntheticBubbleDataset.sample_batch`
    exactly (same float32 distance test): params (B, 5) → (imgs (B,N,N,3),
    bimgs (B,N,N,1), eimgs (B,N,N,1)).  Equivalence:
    tests/test_be.py::test_device_bubble_render_matches_host."""
    import jax.numpy as jnp

    n = img_size
    yy = jnp.arange(n, dtype=jnp.float32)[:, None]
    xx = jnp.arange(n, dtype=jnp.float32)[None, :]
    cx = params[:, 0][:, None, None]
    cy = params[:, 1][:, None, None]
    rx = params[:, 2][:, None, None]
    ry = params[:, 3][:, None, None]
    gray = params[:, 4][:, None, None]
    d = ((xx[None] - cx) / rx) ** 2 + ((yy[None] - cy) / ry) ** 2
    inside = d <= 1.0
    ring = inside & (d >= 0.75)
    img1 = jnp.where(ring, 0.0, jnp.where(inside, gray, 1.0))
    imgs = jnp.repeat(img1[..., None], 3, axis=-1)
    bimgs = inside.astype(jnp.float32)[..., None]
    eimgs = ring.astype(jnp.float32)[..., None]
    return imgs, bimgs, eimgs
