"""ctypes bindings for the native C++ data path (graceful cv2 fallback).

``load()`` compiles ``libvssdata.so`` on first use if a toolchain is present
(``make -C vss_cffm_tpu/native``); callers use :func:`available` to decide
between the native and the cv2/numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvssdata.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vss_decode_jpeg.restype = ctypes.c_int
    lib.vss_jpeg_dims.restype = ctypes.c_int
    lib.vss_decode_clip_normalized.restype = ctypes.c_int
    lib.vss_train_frame.restype = ctypes.c_int
    lib.vss_train_clip.restype = ctypes.c_int
    lib.vss_png_dims.restype = ctypes.c_int
    lib.vss_decode_label.restype = ctypes.c_int
    lib.vss_train_clip_v2.restype = ctypes.c_int
    lib.vss_decode_label_band.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 BGR HWC (cv2-compatible)."""
    lib = load()
    assert lib is not None
    h, w = ctypes.c_int(), ctypes.c_int()
    buf = np.frombuffer(data, np.uint8)
    rc = lib.vss_jpeg_dims(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise ValueError("invalid JPEG header")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.vss_decode_jpeg(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h.value, w.value,
    )
    if rc != 0:
        raise ValueError(f"JPEG decode failed ({rc})")
    return out


def normalize_f32(img: np.ndarray, mean: np.ndarray, std: np.ndarray,
                  to_rgb: bool = True) -> np.ndarray:
    """uint8 BGR HWC → f32 normalized (optionally RGB) — single fused pass."""
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img)
    out = np.empty(img.shape, np.float32)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    lib.vss_normalize_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(img.shape[0] * img.shape[1]),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(1 if to_rgb else 0),
    )
    return out


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """Peek (height, width) from a JPEG header without a full decode."""
    lib = load()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.vss_jpeg_dims(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise ValueError("invalid JPEG header")
    return h.value, w.value


def decode_label(data: bytes, lut: np.ndarray) -> np.ndarray | None:
    """Palette/gray PNG index plane → uint8 (H, W) mapped through a 256-entry
    LUT (fused reduce_zero_label). Returns None for PNG variants the native
    decoder does not handle (caller falls back to PIL)."""
    lib = load()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.vss_png_dims(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    out = np.empty((h.value, w.value), np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    assert lut.size == 256
    rc = lib.vss_decode_label(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h.value, w.value,
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def resize_window(src: np.ndarray, rh: int, rw: int, y1: int, x1: int,
                  vh: int, vw: int, flip: bool = False) -> np.ndarray:
    """cv2-bitwise INTER_LINEAR resize of (sh, sw, 3) uint8 to the (rh, rw)
    geometry, emitting only the [y1:y1+vh, x1:x1+vw] window (optionally
    h-flipped) — O(window) work, the resized image is never materialized."""
    lib = load()
    assert lib is not None
    src = np.ascontiguousarray(src)
    out = np.empty((vh, vw, 3), np.uint8)
    lib.vss_resize_window_u8c3(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1], rh, rw, y1, x1, vh, vw,
        ctypes.c_int(1 if flip else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), vw,
    )
    return out


def train_clip(buffers: list[bytes], sh: int, sw: int, rh: int, rw: int,
               y1: int, x1: int, ch: int, cw: int, flip: bool,
               n_threads: int = 2) -> np.ndarray:
    """Fused train-clip pipeline: JPEG decode → window bilinear resize →
    crop → flip, threaded over frames → (N, ch, cw, 3) uint8 BGR, zero-padded
    outside the valid (min(ch, rh-y1), min(cw, rw-x1)) region."""
    lib = load()
    assert lib is not None
    n = len(buffers)
    arrays = [np.frombuffer(b, np.uint8) for b in buffers]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in arrays]
    )
    lens = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
    out = np.zeros((n, ch, cw, 3), np.uint8)
    rc = lib.vss_train_clip(
        ptrs, lens, n, sh, sw, rh, rw, y1, x1, ch, cw,
        ctypes.c_int(1 if flip else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(n_threads),
    )
    if rc != 0:
        raise ValueError(f"train clip decode failed ({rc})")
    return out


def train_clip_v2(buffers: list[bytes], sh: int, sw: int, rh: int, rw: int,
                  y1: int, x1: int, ch: int, cw: int, flip: bool,
                  pmd: np.ndarray | None, n_threads: int = 2) -> np.ndarray:
    """:func:`train_clip` with PhotoMetricDistortion fused into each decode
    worker. ``pmd`` is the (N, 10) f32 per-frame parameter block from
    :func:`vss_cffm_tpu.data.transforms.draw_pmd_params` (or None to skip);
    the distortion runs on the valid (pre-pad) window while the decoded crop
    is still hot in cache — bit-identical to the cv2 LUT/cvtColor pipeline."""
    lib = load()
    assert lib is not None
    n = len(buffers)
    arrays = [np.frombuffer(b, np.uint8) for b in buffers]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in arrays]
    )
    lens = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
    out = np.zeros((n, ch, cw, 3), np.uint8)
    if pmd is None:
        pmd_ptr = ctypes.POINTER(ctypes.c_float)()
    else:
        pmd = np.ascontiguousarray(pmd, np.float32)
        assert pmd.shape == (n, 10)
        pmd_ptr = pmd.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.vss_train_clip_v2(
        ptrs, lens, n, sh, sw, rh, rw, y1, x1, ch, cw,
        ctypes.c_int(1 if flip else 0), pmd_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(n_threads),
    )
    if rc != 0:
        raise ValueError(f"train clip decode failed ({rc})")
    return out


def pmd_apply(img: np.ndarray, params: np.ndarray) -> np.ndarray:
    """PhotoMetricDistortion in place on a contiguous (H, W, 3) uint8 BGR
    image with a 10-float parameter block (row geometry matters: cv2's
    HSV→BGR kernel casts differently in its per-row SIMD body vs tail)."""
    lib = load()
    assert lib is not None
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[-1] == 3
    assert img.flags.c_contiguous
    params = np.ascontiguousarray(params, np.float32)
    assert params.size == 10
    lib.vss_pmd_apply(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(img.shape[0]), ctypes.c_int64(img.shape[1]),
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return img


def cvt_hsv(src: np.ndarray, inverse: bool = False) -> np.ndarray:
    """cv2-exact uint8 BGR→HSV (or HSV→BGR with ``inverse``) of an
    (H, W, 3) image (row geometry matters for the inverse direction)."""
    lib = load()
    assert lib is not None
    src = np.ascontiguousarray(src)
    assert src.dtype == np.uint8 and src.ndim == 3 and src.shape[-1] == 3
    out = np.empty_like(src)
    lib.vss_cvt_hsv_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(src.shape[0]), ctypes.c_int(src.shape[1]),
        ctypes.c_int(1 if inverse else 0),
    )
    return out


def label_window(src: np.ndarray, rh: int, rw: int, y1: int, x1: int,
                 vh: int, vw: int, flip: bool = False, src_row0: int = 0,
                 sh: int | None = None) -> np.ndarray:
    """cv2-exact INTER_NEAREST resize of a (sh, sw) uint8 plane to (rh, rw),
    emitting only the [y1:y1+vh, x1:x1+vw] window (optionally h-flipped).
    ``src`` may be a row band starting at source row ``src_row0`` of a plane
    whose full height is ``sh`` (defaults to the full plane)."""
    lib = load()
    assert lib is not None
    src = np.ascontiguousarray(src)
    assert src.dtype == np.uint8 and src.ndim == 2
    if sh is None:
        sh = src_row0 + src.shape[0]
    out = np.empty((vh, vw), np.uint8)
    lib.vss_label_window(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(src_row0), ctypes.c_int(sh), ctypes.c_int(src.shape[1]),
        rh, rw, y1, x1, vh, vw, ctypes.c_int(1 if flip else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int(vw),
    )
    return out


def label_window_rows(sh: int, rh: int, y1: int, vh: int) -> tuple[int, int]:
    """Source row band [r_lo, r_hi] (inclusive) that :func:`label_window`
    touches for window rows [y1, y1+vh) of the (rh, ·) resized geometry."""
    lib = load()
    assert lib is not None
    lo, hi = ctypes.c_int(), ctypes.c_int()
    lib.vss_label_window_rows(sh, rh, y1, vh, ctypes.byref(lo), ctypes.byref(hi))
    return lo.value, hi.value


def decode_label_band(data: bytes, lut: np.ndarray, r0: int,
                      r1: int) -> np.ndarray | None:
    """Band-limited :func:`decode_label`: decode PNG index rows [r0, r1]
    (inclusive) through the 256-entry LUT. Rows below r1 are never read.
    Returns None for PNG variants the native decoder does not handle."""
    lib = load()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.vss_png_dims(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    out = np.empty((r1 - r0 + 1, w.value), np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    assert lut.size == 256
    rc = lib.vss_decode_label_band(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h.value, w.value,
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(r0), ctypes.c_int(r1),
    )
    return out if rc == 0 else None


def png_dims(data: bytes) -> tuple[int, int] | None:
    """Peek (height, width) from a PNG header, or None if not a PNG."""
    lib = load()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.vss_png_dims(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(h), ctypes.byref(w),
    )
    return (h.value, w.value) if rc == 0 else None


def decode_clip_normalized(buffers: list[bytes], h: int, w: int,
                           mean: np.ndarray, std: np.ndarray,
                           to_rgb: bool = True, n_threads: int = 4) -> np.ndarray:
    """N same-sized JPEGs → (N, h, w, 3) f32 normalized, threaded decode."""
    lib = load()
    assert lib is not None
    n = len(buffers)
    arrays = [np.frombuffer(b, np.uint8) for b in buffers]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in arrays]
    )
    lens = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
    out = np.empty((n, h, w, 3), np.float32)
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    rc = lib.vss_decode_clip_normalized(
        ptrs, lens, n, h, w,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(1 if to_rgb else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(n_threads),
    )
    if rc != 0:
        raise ValueError(f"clip decode failed ({rc})")
    return out
