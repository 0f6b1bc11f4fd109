"""Synthetic circle dataset — rebuild of reference CDataset
(datasets/dataset.py:23-93) designed TPU-first.

The reference generates each circle image per-sample on the host with numpy
meshgrids and collates encoded params on the CPU.  Here only the (tiny) param
triples live on the host; images are rendered *on device inside the jit step*
(ops/geometry.render_circle_batch) so the input pipeline is never a
bottleneck and there is no H2D image traffic at all.
"""

from dataclasses import dataclass
from typing import Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from vaeplay_tpu.ops.geometry import encode_circle_param


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


def encode_targets(n: int, params: np.ndarray) -> jnp.ndarray:
    """(B, 3) raw [radius, cx, cy] → (B, 3) encoded [log r/n, x, y] targets —
    the collate_fn's encoding (datasets/dataset.py:71-93)."""
    enc = encode_circle_param(
        n, jnp.asarray(params[:, 0]), jnp.asarray(params[:, 1]), jnp.asarray(params[:, 2])
    )
    return jnp.stack([enc["radius"], enc["x"], enc["y"]], axis=-1)
