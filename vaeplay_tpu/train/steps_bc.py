"""Fused train step for BC (reference train_BC.py:52-68).

losses = (edge BCE+dice) + (mask BCE+dice)
         + chamfer point-regression(pred contours+regressions vs GT contours
           and RDP key contours)
Adam(lr) with StepLR(10, 0.5) handled by the CLI's schedule; backbone
stem/layer1 frozen (torchvision trainable_layers=3).
"""

import functools

import jax
import jax.numpy as jnp

from vaeplay_tpu.ops import losses as L
from vaeplay_tpu.train.state import TrainState, stop_frozen_gradients


def make_bc_train_step(model, max_points: int = 256, external_contours: bool = False,
                       freeze_backbone: bool = True,
                       compute_dtype=None):
    """jit step for BC.

    callback mode (default):  (state, imgs, bimgs, eimgs, tgt...) — contour
    trace happens inside the program via pure_callback.
    external mode (axon runtime, no host-callback support):
    (state, imgs, pts, counts, bimgs, eimgs, tgt...) — the caller traces
    contours between a jitted `mask_probs` pass and this step (use
    `make_bc_mask_step` + ops.contour.batch_find_contours).

    compute_dtype=bfloat16 runs the backbone/head conv FLOPs in bf16 on top
    of the (independently controlled) refine-FC dtype; master params / Adam
    moments / BN stats / losses stay f32 (utils/amp.py policy).
    """
    from vaeplay_tpu.utils.amp import merge_batch_stats, to_compute, to_f32

    def loss_fn(params, batch_stats, constants, imgs, contours, bimgs, eimgs,
                tgt_pts, tgt_mask, key_pts, key_mask):
        # frozen-stem gradient cut — see state.stop_frozen_gradients.
        # freeze_backbone=True REQUIRES an optimizer that masks conv1/layer1
        # (state.frozen_backbone_adam); pass False for full fine-tuning.
        if freeze_backbone:
            params = stop_frozen_gradients(params)
        variables = {"params": to_compute(params, compute_dtype),
                     "batch_stats": to_compute(batch_stats, compute_dtype)}
        if constants:
            variables["constants"] = to_compute(constants, compute_dtype)
        preds, mut = model.apply(
            variables, to_compute(imgs, compute_dtype), train=True,
            contours=contours, mutable=["batch_stats"],
        )
        preds, mut = to_f32(preds), to_f32(mut)
        loss_edge = L.mask_edge_losses(preds["edges"], eimgs)
        loss_mask = L.mask_edge_losses(preds["masks"], bimgs)
        n = preds["contours"].shape[1]
        pred_mask = (jnp.arange(n)[None, :]
                     < preds["contour_counts"][:, None]).astype(jnp.float32)
        loss_regress = L.chamfer_pt_regression_loss(
            preds["contours"], pred_mask, preds["contour_regressions"],
            tgt_pts, tgt_mask, key_pts, key_mask,
        )
        total = loss_edge + loss_mask + loss_regress
        return total, ({"loss_edge": loss_edge, "loss_mask": loss_mask,
                        "loss_regress": loss_regress},
                       merge_batch_stats(batch_stats, mut["batch_stats"],
                                         compute_dtype))

    if external_contours:
        @jax.jit
        def train_step(state: TrainState, imgs, pts, counts, bimgs, eimgs,
                       tgt_pts, tgt_mask, key_pts, key_mask):
            grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, state.constants,
                imgs, (pts, counts), bimgs, eimgs,
                tgt_pts, tgt_mask, key_pts, key_mask,
            )
            state = state.apply_gradients(grads, new_batch_stats=new_bs)
            return state, metrics
    else:
        @jax.jit
        def train_step(state: TrainState, imgs, bimgs, eimgs,
                       tgt_pts, tgt_mask, key_pts, key_mask):
            grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, state.constants,
                imgs, None, bimgs, eimgs, tgt_pts, tgt_mask, key_pts, key_mask,
            )
            state = state.apply_gradients(grads, new_batch_stats=new_bs)
            return state, metrics

    return train_step


def make_bc_mask_step(model, stride: int = 1, compute_dtype=None):
    """Stage A for external-contour mode: jit (state, imgs) → bit-packed
    thresholded mask (train-mode statistics, batch_stats updates discarded —
    the contour source matches the training forward's mask,
    networks_BC.py:217).  Returned packed array unpacks with
    `unpack_mask_bits` before the host contour trace; packing cuts the
    device→host tunnel transfer 32x vs f32 probabilities, and stride=4
    subsamples the mask first for another 16x (trace coords scale back by
    `stride` on the host).  compute_dtype matches the train step's policy
    (the mask is thresholded at 0.5, insensitive to bf16 rounding)."""
    from vaeplay_tpu.utils.amp import to_compute

    @jax.jit
    def mask_step(state: TrainState, imgs):
        variables = {"params": to_compute(state.params, compute_dtype),
                     "batch_stats": to_compute(state.batch_stats, compute_dtype)}
        if state.constants:
            variables["constants"] = to_compute(state.constants, compute_dtype)
        packed, _ = model.apply(
            variables, to_compute(imgs, compute_dtype), train=True,
            stride=stride, method=model.mask_bits, mutable=["batch_stats"],
        )
        return packed

    return mask_step


def unpack_mask_bits(packed, width: int):
    """(B, H, W/8) uint8 → (B, H, width) float32 binary masks on the host."""
    import numpy as np

    bits = np.unpackbits(np.asarray(packed), axis=-1)
    return bits[:, :, :width].astype(np.float32)


def strided_mask_width(img_size: int, stride: int) -> int:
    """Row width of the stage-A bridge mask: the model pads the mask by 1 on
    each side before tracing (networks_BC.py:217-219 `padding`), and stride
    subsampling takes every stride-th column — ceil((img_size + 2) / stride).
    Single source of truth for the bridge's bit-pack/unpack contract."""
    return -(-(img_size + 2) // stride)


class BridgeTracer:
    """Host side of the BC external-contour bridge.

    Owns the single worker thread that performs the blocking device→host sync
    (np.asarray on the bit-packed stage-A mask) and the native contour trace,
    so the caller's main thread never stalls on the tunnel's sync latency —
    stage A of batch i syncs/traces while batch i-1's train program runs on
    the device.  Returned points are rescaled back to full-resolution image
    coordinates when stride > 1.
    """

    def __init__(self, img_size: int, stride: int, max_points: int,
                 threshold: float = 0.5):
        from concurrent.futures import ThreadPoolExecutor

        self.stride = max(stride, 1)
        self.max_points = max_points
        self.threshold = threshold
        self.mask_w = strided_mask_width(img_size, self.stride)
        self._pool = ThreadPoolExecutor(1)

    def trace(self, packed):
        """Blocking unpack + contour trace → (pts, counts) numpy arrays."""
        import numpy as np

        from vaeplay_tpu.ops.contour import batch_find_contours

        masks = unpack_mask_bits(packed, self.mask_w)
        pts, counts = batch_find_contours(
            masks, max_points=self.max_points, threshold=self.threshold)
        if self.stride > 1:
            pts = pts * np.float32(self.stride)
        return pts, counts

    def submit(self, packed):
        """Run trace() on the worker thread; returns a Future."""
        return self._pool.submit(self.trace, packed)
