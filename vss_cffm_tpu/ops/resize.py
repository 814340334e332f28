"""Bilinear / nearest resize with exact PyTorch ``F.interpolate`` semantics.

The reference model path calls ``mmseg.ops.resize`` (a thin wrapper over
``torch.nn.functional.interpolate``, reference ``mmseg/ops/wrappers.py:8-30``)
roughly ten times per forward (decode-head upsampling, 1/4→1/8 downsampling,
loss-side upsampling, whole-image rescale). Numerical parity with PyTorch's
half-pixel convention (``align_corners=False``) therefore matters for
checkpoint-parity validation.

TPU-native design: instead of gather-based interpolation, the 1-D
interpolation along each spatial axis is expressed as a dense
``(out_size, in_size)`` weight matrix applied via matmul. The matrices are
computed in numpy at trace time (shapes are static under jit), cached, and
embedded as constants — XLA folds them into MXU matmuls, which is both exact
and fast. Interpolation weights match
``torch.nn.functional.interpolate(mode='bilinear')`` bit-for-bit in f32 for
both up- and down-sampling (PyTorch does not antialias).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["resize_bilinear", "resize_nearest", "bilinear_weight_matrix"]


@functools.lru_cache(maxsize=None)
def _bilinear_weight_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix, f32.

    Source coordinates follow PyTorch's ``area_pixel_compute_source_index``:
    ``src = (dst + 0.5) * in/out - 0.5`` clamped below at 0 for
    ``align_corners=False``; ``src = dst * (in-1)/(out-1)`` otherwise.
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = dst * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
        src = np.maximum(src, 0.0)
    x0 = np.floor(src).astype(np.int64)
    x0 = np.minimum(x0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    lam = (src - x0).astype(np.float64)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(w, (rows, x0), 1.0 - lam)
    np.add.at(w, (rows, x1), lam)
    return w.astype(np.float32)


def bilinear_weight_matrix(in_size: int, out_size: int, align_corners: bool = False) -> np.ndarray:
    """Public accessor for the cached interpolation matrix."""
    return _bilinear_weight_matrix_np(int(in_size), int(out_size), bool(align_corners))


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """Bilinearly resize ``x`` of shape (..., H, W, C) to (..., H', W', C).

    Matmul-based: ``out = Wh @ x @ Ww^T`` along the two spatial axes.

    Precision policy: f32 inputs interpolate with f32-highest matmuls (exact
    torch parity — used on logits for loss/eval); bf16 inputs stay bf16 with
    bf16 weights — the interpolation weights have ≤2 nonzeros per row so the
    rounding impact is one bf16 multiply-add, while the MXU runs at full
    rate (f32-highest was ~50µs per head upsample; bf16 is ~free).
    """
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    dtype = x.dtype
    fast = dtype == jnp.bfloat16
    precision = None if fast else "highest"
    xf = x if fast else x.astype(jnp.float32)

    def weights(size_in, size_out):
        w = jnp.asarray(_bilinear_weight_matrix_np(size_in, size_out, align_corners))
        return w.astype(dtype) if fast else w

    if h_in != h_out:
        xf = jnp.einsum("oh,...hwc->...owc", weights(h_in, h_out), xf, precision=precision)
    if w_in != w_out:
        xf = jnp.einsum("ow,...hwc->...hoc", weights(w_in, w_out), xf, precision=precision)
    return xf.astype(dtype)


@functools.lru_cache(maxsize=None)
def _nearest_index_np(in_size: int, out_size: int) -> np.ndarray:
    """PyTorch ``mode='nearest'`` source indices: ``floor(dst * in/out)``."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * (in_size / out_size))
    return np.minimum(idx.astype(np.int64), in_size - 1)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of (..., H, W, C), PyTorch ``nearest`` parity."""
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    hi = jnp.asarray(_nearest_index_np(h_in, h_out))
    wi = jnp.asarray(_nearest_index_np(w_in, w_out))
    return x[..., hi, :, :][..., wi, :]
