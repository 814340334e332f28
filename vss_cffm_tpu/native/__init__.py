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
