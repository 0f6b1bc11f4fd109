"""Synthetic circle dataset — rebuild of reference CDataset
(datasets/dataset.py:23-93) designed TPU-first.

The reference generates each circle image per-sample on the host with numpy
meshgrids and collates encoded params on the CPU.  Here only the (tiny) param
triples live on the host; images are rendered *on device inside the jit step*
(ops/geometry.render_circle_batch) so the input pipeline is never a
bottleneck and there is no H2D image traffic at all.
"""

import os
from dataclasses import dataclass
from typing import Iterator, Tuple

import numpy as np


@dataclass
class CircleDataset:
    """Procedural circles: params ~ the reference's generate_circle_param."""

    n: int = 128
    min_radius: int = 10
    data_size: int = 4096
    seed: int = 0

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        half = self.n // 2
        radius = rng.integers(self.min_radius, half - self.min_radius, size=self.data_size)
        # per-sample high bound depends on radius → draw wide then mod
        cx = radius + (rng.integers(0, 1 << 30, size=self.data_size) % (self.n - 2 * radius))
        cy = radius + (rng.integers(0, 1 << 30, size=self.data_size) % (self.n - 2 * radius))
        self.params = np.stack([radius, cx, cy], axis=-1).astype(np.float32)

    def __len__(self) -> int:
        return self.data_size

    def epoch_batches(
        self, batch_size: int, epoch_seed: int = 0, drop_remainder: bool = True
    ) -> Iterator[np.ndarray]:
        """Yield shuffled (B, 3) [radius, cx, cy] param batches."""
        order = np.random.default_rng(epoch_seed).permutation(self.data_size)
        stop = (self.data_size // batch_size) * batch_size if drop_remainder else self.data_size
        for i in range(0, stop, batch_size):
            yield self.params[order[i : i + batch_size]]


def render_circle_np(n: int, x: float, y: float, radius: float) -> np.ndarray:
    """Host-side circle render matching generate_circle_img
    (tools/utils.py:24-42): white disk on black, (n, n, 1) float in [0, 1]."""
    ys, xs = np.mgrid[0:n, 0:n]
    d = np.sqrt((xs - x) ** 2 + (ys - y) ** 2)
    return (d <= radius).astype(np.float32)[..., None]


def write_circle_dataset(data_dir: str, dataset: "CircleDataset") -> int:
    """Write a generated dataset to disk in the reference's filename-encoded
    layout `{idx}_{radius}_{x}_{y}.png` (CDataset ifWrite, dataset.py:57-58).
    Returns the number of files written."""
    from PIL import Image

    os.makedirs(data_dir, exist_ok=True)
    for i, (r, x, y) in enumerate(dataset.params):
        img = (render_circle_np(dataset.n, x, y, r)[..., 0] * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(data_dir, f"{i}_{int(r)}_{int(x)}_{int(y)}.png"))
    return len(dataset.params)


class DiskCircleDataset:
    """The reference CDataset's disk-load mode (ifGen=False,
    dataset.py:35-48): scan `data_dir` for `{idx}_{r}_{x}_{y}.png` files,
    decode params from the filename, load grayscale images (downscaled to n
    when larger, dataset.py:65-67).  epoch_batches yields (imgs, params)."""

    def __init__(self, data_dir: str, n: int):
        from PIL import Image  # noqa: F401 — fail fast if PIL is absent

        self.n = n
        self.files = []
        self.params = []
        for f in sorted(os.listdir(data_dir)):
            stem = f.split(".")[0]
            try:
                _, r, x, y = stem.split("_")
            except ValueError:
                continue
            self.files.append(os.path.join(data_dir, f))
            self.params.append((float(r), float(x), float(y)))
        self.params = np.asarray(self.params, np.float32).reshape(-1, 3)

    def __len__(self) -> int:
        return len(self.files)

    def load(self, idx: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(self.files[idx]).convert("L")
        if img.size[0] > self.n:
            img = img.resize((self.n, self.n))
        return (np.asarray(img, np.float32) / 255.0)[..., None]

    def epoch_batches(
        self, batch_size: int, epoch_seed: int = 0, drop_remainder: bool = True,
        workers: int = 0,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """workers > 0 pools the per-file PNG decode on a thread pool."""
        from vaeplay_tpu.data.prefetch import batched_loads

        order = np.random.default_rng(epoch_seed).permutation(len(self))
        stop = (len(self) // batch_size) * batch_size if drop_remainder else len(self)
        for i, items in zip(
            range(0, stop, batch_size),
            batched_loads(self.load, order, batch_size, workers, drop_remainder),
        ):
            sel = order[i : i + len(items)]
            yield np.stack(items), self.params[sel]


def encode_targets(n: int, params: np.ndarray) -> np.ndarray:
    """(B, 3) raw [radius, cx, cy] → (B, 3) encoded [log r/n, x, y] targets —
    the collate_fn's encoding (datasets/dataset.py:71-93).

    Pure numpy on purpose: this runs on the host per training batch (disk
    mode), and eager jnp ops here would cost a device round-trip each
    (CLAUDE.md tunnel rules).  Mirrors ops/geometry.encode_circle_param."""
    params = np.asarray(params, np.float32)
    half = n // 2
    return np.stack([
        np.log(params[:, 0] / n),
        (params[:, 1] - half) / half,
        (params[:, 2] - half) / half,
    ], axis=-1).astype(np.float32)
