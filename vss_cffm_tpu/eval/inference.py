"""Whole / sliding-window inference + test-time augmentation.

Parity with the reference inference modes
(``mmseg/models/segmentors/encoder_decoder.py``):

- ``whole_inference`` (``:502-516``): forward, upsample to original shape;
- ``slide_inference`` (``:457-500``): overlapping crops accumulated with a
  count matrix — restructured for XLA as a static unrolled grid of crops
  (crop geometry is static given (H, W, crop, stride)) with scatter-adds;
- ``tta_inference`` ≙ ``aug_test`` + ``MultiScaleFlipAug`` (``base.py:76-111``,
  ``test_time_aug.py:10-133``): average softmax over scales/flips, with the
  flip-unflip handled before averaging (``encoder_decoder.py:543-551``).

All functions take/return NHWC jnp arrays and are jit-friendly per shape.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear

__all__ = ["whole_inference", "slide_inference", "tta_inference"]


def whole_inference(logits_fn: Callable, imgs: jnp.ndarray, ori_shape: tuple[int, int]) -> jnp.ndarray:
    """imgs (B?, T, H, W, 3) clip -> softmax probs at ori_shape."""
    logits = logits_fn(imgs)  # (B, h, w, C)
    logits = resize_bilinear(logits, imgs.shape[-3:-1])
    logits = resize_bilinear(logits, ori_shape)
    return jax.nn.softmax(logits, axis=-1)


def slide_inference(
    logits_fn: Callable,
    imgs: jnp.ndarray,  # (B, T, H, W, 3)
    ori_shape: tuple[int, int],
    crop_size: tuple[int, int],
    stride: tuple[int, int],
) -> jnp.ndarray:
    """Sliding-window logits accumulation (reference ``:457-500``)."""
    b, t, h_img, w_img, _ = imgs.shape
    h_crop, w_crop = crop_size
    h_stride, w_stride = stride
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1

    preds = None
    count = jnp.zeros((1, h_img, w_img, 1), jnp.float32)
    for hi in range(h_grids):
        for wi in range(w_grids):
            y1 = min(hi * h_stride, max(h_img - h_crop, 0))
            x1 = min(wi * w_stride, max(w_img - w_crop, 0))
            crop = imgs[:, :, y1 : y1 + h_crop, x1 : x1 + w_crop]
            logit = logits_fn(crop)  # (B, h', w', C)
            logit = resize_bilinear(logit, (h_crop, w_crop))
            if preds is None:
                preds = jnp.zeros((b, h_img, w_img, logit.shape[-1]), jnp.float32)
            preds = jax.lax.dynamic_update_slice(
                preds,
                jax.lax.dynamic_slice(preds, (0, y1, x1, 0), (b, h_crop, w_crop, logit.shape[-1]))
                + logit.astype(jnp.float32),
                (0, y1, x1, 0),
            )
            count = jax.lax.dynamic_update_slice(
                count,
                jax.lax.dynamic_slice(count, (0, y1, x1, 0), (1, h_crop, w_crop, 1)) + 1.0,
                (0, y1, x1, 0),
            )
    preds = preds / count
    preds = resize_bilinear(preds, ori_shape)
    return jax.nn.softmax(preds, axis=-1)


def tta_inference(
    logits_fn: Callable,
    clips: Sequence[jnp.ndarray],  # one (B, T, H_s, W_s, 3) per scale
    flips: Sequence[bool],
    ori_shape: tuple[int, int],
) -> jnp.ndarray:
    """Average softmax over augmented views; horizontal unflip before mean."""
    total = None
    for imgs, flip in zip(clips, flips):
        view = imgs[:, :, :, ::-1] if flip else imgs
        prob = whole_inference(logits_fn, view, ori_shape)
        if flip:
            prob = prob[:, :, ::-1]
        total = prob if total is None else total + prob
    return total / len(clips)
