"""Bucketed batch predictor — fixed-shape serving for variable-size batches.

The manga serve path (reference test_BE_manga.py:414-462) batches
bubbles-per-page, and the bubble count varies page to page.  Under jit every
distinct batch size is a distinct XLA program: on TPU that is a fresh 20-60 s
compile through the tunnel per new page shape.  `BucketedPredictor` pads each
request up to the next power-of-two bucket (and splits requests larger than
`max_batch` into chunks), so at most log2(max_batch)+1 programs ever compile,
while callers still get exactly-their-batch results back.

Per-sample model outputs make padding exact: BE/BE_GAN nets are per-sample
(convs + frozen BatchNorm inference stats — no cross-batch coupling), so
rows of the padded output equal the rows of any other batch shape; the
equivalence is asserted by tests/test_predictor.py.
"""

import functools
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(1,))
def _cast_pad(x: jnp.ndarray, bucket: int) -> jnp.ndarray:
    """Normalize uint8 crops to f32/255 and edge-repeat-pad to the bucket
    size ON DEVICE.  Uploading uint8 and padding device-side cuts the
    host→device transfer 4x (dtype) times bucket/n (padding) — the transfer,
    not the forward, dominates tunnel-attached page serving
    (tools/probe_manga_stages.py).  uint8→f32/255 on device is bit-identical
    to the host-side conversion it replaces; this program is a few fused ops,
    so the per-distinct-n compile is negligible next to the bucketed forward."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    n = x.shape[0]
    if bucket != n:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (bucket - n,) + x.shape[1:])], axis=0)
    return x


def next_bucket(n: int, max_batch: int) -> int:
    """Smallest power-of-two ≥ n, capped at max_batch (n ≤ max_batch)."""
    assert 0 < n <= max_batch, (n, max_batch)
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class BucketedPredictor:
    """Wraps a jitted `eval_step(state, imgs) -> dict of (B, ...) arrays` so
    callers may pass any leading batch size without triggering per-shape
    recompiles.

    - requests with n ≤ max_batch pad (edge-repeat row 0) to the next
      power-of-two bucket;
    - larger requests run in max_batch chunks (the tail chunk buckets);
    - outputs are sliced back to the true n and stacked on host.
    """

    def __init__(self, eval_step: Callable, state, max_batch: int = 32):
        self._step = eval_step
        self._state = state
        self.max_batch = int(max_batch)
        self.compiled_buckets: set = set()   # observability: shapes seen

    def _run_bucket(self, imgs: np.ndarray) -> Dict[str, np.ndarray]:
        n = imgs.shape[0]
        bucket = next_bucket(n, self.max_batch)
        self.compiled_buckets.add(bucket)
        # upload the exact-n (possibly uint8) batch; cast + pad on device
        out = self._step(self._state, _cast_pad(jnp.asarray(imgs), bucket))
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def __call__(self, imgs) -> Dict[str, np.ndarray]:
        imgs = np.asarray(imgs)
        n = imgs.shape[0]
        if n == 0:
            raise ValueError("empty batch")
        if n <= self.max_batch:
            return self._run_bucket(imgs)
        chunks = [
            self._run_bucket(imgs[i:i + self.max_batch])
            for i in range(0, n, self.max_batch)
        ]
        return {
            k: np.concatenate([c[k] for c in chunks], axis=0) for k in chunks[0]
        }


def make_packed_be_predict(model, state, img_size: int, max_batch: int = 32,
                           compute_dtype=None) -> Callable:
    """Bucketed BE/BE_GAN serve predictor over the bit-packed eval step.

    The manga paste routes consume 0.5-thresholded masks (eval/manga.py), so
    the device ships 1 bit/pixel instead of 4 bytes — 32× less tunnel
    traffic, which dominates page serve latency on a tunnel-attached host.
    Returns `predict(imgs) -> {"masks", "edges"}` as (B, S, S, 1) float32
    {0, 1} maps — drop-in for the probability predictor, since downstream
    thresholding of an already-binary map is the identity.
    """
    from vaeplay_tpu.train.steps_be import make_be_eval_step_packed
    from vaeplay_tpu.train.steps_bc import unpack_mask_bits

    bucketed = BucketedPredictor(
        make_be_eval_step_packed(model, compute_dtype), state, max_batch)

    def predict(imgs) -> Dict[str, np.ndarray]:
        out = bucketed(imgs)
        return {k: unpack_mask_bits(v, img_size)[..., None]
                for k, v in out.items()}

    return predict
