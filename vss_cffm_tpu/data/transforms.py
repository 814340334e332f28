"""Clip-synchronized data augmentations (host-side numpy/cv2).

Faithful re-implementations of the live ``*_clips`` pipeline transforms
(reference ``mmseg/datasets/pipelines/transforms.py``), as pure functions on
frame lists with an explicit ``numpy.random.RandomState``:

- one random draw **per clip** for scale / crop / flip
  (``Resize(process_clips=True)`` ``:475``, ``RandomCrop_clips`` ``:1524``,
  ``RandomFlip_clips`` ``:852``),
- independent draws **per frame** for photometric distortion — the reference
  deliberately re-rolls inside the frame loop (``:2114-2137``),
- ``AlignedResize_clips`` for eval: rescale (not pad!) both sides to /32
  multiples (``:236-472``, ``_align`` at ``:382-389``).

Images flow as uint8 BGR (cv2 decode order, matching mmcv) until
``normalize_clip``, which optionally flips to RGB and standardises — exactly
mmcv ``imnormalize`` semantics.
"""

from __future__ import annotations

import cv2
import numpy as np

__all__ = [
    "imrescale",
    "random_scale_clip",
    "sample_crop_box",
    "sample_crop_box_windowed",
    "random_crop_clip",
    "random_flip_clip",
    "photometric_distortion_clip",
    "draw_pmd_params",
    "normalize_clip",
    "pad_clip",
    "aligned_resize_clip",
]

# mmcv default img_norm for SegFormer/CFFM configs (``vspw_repeat2.py:4-5``)
IMG_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMG_STD = np.array([58.395, 57.12, 57.375], np.float32)


def _rescale_factor(hw: tuple[int, int], scale: tuple[int, int]) -> float:
    """mmcv ``rescale_size``: fit (h, w) into (long, short) preserving ratio."""
    h, w = hw
    max_long, max_short = max(scale), min(scale)
    return min(max_long / max(h, w), max_short / min(h, w))


def imrescale(img: np.ndarray, scale: tuple[int, int], nearest: bool = False) -> np.ndarray:
    """mmcv.imrescale: scale-preserving resize to fit (long, short) bounds."""
    h, w = img.shape[:2]
    f = _rescale_factor((h, w), scale)
    new_w, new_h = int(w * f + 0.5), int(h * f + 0.5)
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, (new_w, new_h), interpolation=interp)


def random_scale_clip(
    imgs: list[np.ndarray],
    segs: list[np.ndarray] | None,
    rng: np.random.RandomState,
    img_scale: tuple[int, int] = (853, 480),
    ratio_range: tuple[float, float] = (0.5, 2.0),
) -> tuple[list[np.ndarray], list[np.ndarray] | None]:
    """``Resize(img_scale, ratio_range, process_clips=True)``: one sampled
    ratio applied to every frame (keep_ratio rescale)."""
    lo, hi = ratio_range
    ratio = rng.random_sample() * (hi - lo) + lo
    scale = (int(img_scale[0] * ratio), int(img_scale[1] * ratio))
    imgs = [imrescale(im, scale) for im in imgs]
    if segs is not None:
        segs = [imrescale(s, scale, nearest=True) for s in segs]
    return imgs, segs


def sample_crop_box_windowed(
    h: int,
    w: int,
    window_fn,
    rng: np.random.RandomState,
    crop_size: tuple[int, int] = (480, 480),
    cat_max_ratio: float = 0.75,
    ignore_index: int = 255,
) -> tuple[int, int, int, int]:
    """Crop-box draw of ``RandomCrop_clips`` (reference ``:1566-1579``) on a
    virtual (h, w) label plane: box sampled with the 10-try category-balance
    re-roll, reading candidate crops through ``window_fn(y1, y2, x1, x2)``
    (clamped bounds). Split out so the native fused pipeline can consume the
    same RNG draws while extracting windows straight from the *unresized*
    label (``native.label_window``) — the full resized plane never exists."""
    ch, cw = crop_size

    def sample_box():
        oy = rng.randint(0, max(h - ch, 0) + 1)
        ox = rng.randint(0, max(w - cw, 0) + 1)
        return oy, oy + ch, ox, ox + cw

    def label_counts(seg_tmp):
        # counts of non-ignored labels; bincount for uint8 (np.unique sorts
        # the whole crop — ~10× slower per try), unique otherwise
        if seg_tmp.dtype == np.uint8:
            cnt = np.bincount(seg_tmp.ravel(), minlength=256)
            if 0 <= ignore_index < 256:
                cnt[ignore_index] = 0
            return cnt[cnt > 0]
        labels, cnt = np.unique(seg_tmp, return_counts=True)
        return cnt[labels != ignore_index]

    box = sample_box()
    if cat_max_ratio < 1.0:
        for _ in range(10):
            y1, y2, x1, x2 = box
            cnt = label_counts(window_fn(y1, min(y2, h), x1, min(x2, w)))
            if len(cnt) > 1 and cnt.max() / cnt.sum() < cat_max_ratio:
                break
            box = sample_box()
    return box


def sample_crop_box(
    seg_last: np.ndarray,
    rng: np.random.RandomState,
    crop_size: tuple[int, int] = (480, 480),
    cat_max_ratio: float = 0.75,
    ignore_index: int = 255,
) -> tuple[int, int, int, int]:
    """:func:`sample_crop_box_windowed` on a materialized label plane."""
    h, w = seg_last.shape[:2]
    return sample_crop_box_windowed(
        h, w, lambda y1, y2, x1, x2: seg_last[y1:y2, x1:x2], rng, crop_size,
        cat_max_ratio, ignore_index,
    )


def random_crop_clip(
    imgs: list[np.ndarray],
    segs: list[np.ndarray],
    rng: np.random.RandomState,
    crop_size: tuple[int, int] = (480, 480),
    cat_max_ratio: float = 0.75,
    ignore_index: int = 255,
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """One crop box for the whole clip (see ``sample_crop_box``)."""
    y1, y2, x1, x2 = sample_crop_box(segs[-1], rng, crop_size, cat_max_ratio,
                                     ignore_index)
    return (
        [im[y1:y2, x1:x2] for im in imgs],
        [s[y1:y2, x1:x2] for s in segs],
    )


def random_flip_clip(
    imgs: list[np.ndarray],
    segs: list[np.ndarray] | None,
    rng: np.random.RandomState,
    prob: float = 0.5,
) -> tuple[list[np.ndarray], list[np.ndarray] | None, bool]:
    """Single horizontal-flip draw shared by the clip."""
    flip = rng.rand() < prob
    if flip:
        imgs = [np.ascontiguousarray(im[:, ::-1]) for im in imgs]
        if segs is not None:
            segs = [np.ascontiguousarray(s[:, ::-1]) for s in segs]
    return imgs, segs, flip


def _convert(img, alpha=1.0, beta=0.0):
    if img.dtype == np.uint8:
        # identical per-value math precomputed as a 256-entry LUT and applied
        # with cv2's SIMD table lookup — ~5× faster than three numpy passes
        lut = np.clip(np.arange(256, dtype=np.float32) * np.float32(alpha)
                      + np.float32(beta), 0, 255).astype(np.uint8)
        return cv2.LUT(np.ascontiguousarray(img), lut)
    out = img.astype(np.float32) * alpha + beta
    return np.clip(out, 0, 255).astype(np.uint8)


def photometric_distortion_clip(
    imgs: list[np.ndarray],
    rng: np.random.RandomState,
    brightness_delta: int = 32,
    contrast_range: tuple[float, float] = (0.5, 1.5),
    saturation_range: tuple[float, float] = (0.5, 1.5),
    hue_delta: int = 18,
) -> list[np.ndarray]:
    """Brightness/contrast/saturation/hue jitter, re-rolled **per frame**
    (reference ``PhotoMetricDistortion_clips.__call__:2114-2137``)."""

    def one(img):
        if rng.randint(2):
            img = _convert(img, beta=rng.uniform(-brightness_delta, brightness_delta))
        mode = rng.randint(2)
        if mode == 1 and rng.randint(2):
            img = _convert(img, alpha=rng.uniform(*contrast_range))
        if rng.randint(2):
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            hsv[:, :, 1] = _convert(hsv[:, :, 1], alpha=rng.uniform(*saturation_range))
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        if rng.randint(2):
            hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
            # (h + d) % 180 as a LUT — identical values, SIMD lookup
            lut = ((np.arange(256) + rng.randint(-hue_delta, hue_delta))
                   % 180).astype(np.uint8)
            hsv[:, :, 0] = cv2.LUT(np.ascontiguousarray(hsv[:, :, 0]), lut)
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        if mode == 0 and rng.randint(2):
            img = _convert(img, alpha=rng.uniform(*contrast_range))
        return img

    return [one(im) for im in imgs]


def draw_pmd_params(
    rng: np.random.RandomState,
    brightness_delta: int = 32,
    contrast_range: tuple[float, float] = (0.5, 1.5),
    saturation_range: tuple[float, float] = (0.5, 1.5),
    hue_delta: int = 18,
) -> np.ndarray:
    """Draw one frame's photometric-distortion parameters — the exact RNG
    stream of :func:`photometric_distortion_clip`'s per-frame closure, split
    from the application so the native fused pipeline
    (``native/dataloader.cpp:pmd_apply_window``) can run the pixel work.

    Returns the 10-float block ``[bright?, beta, contrast_pre?, alpha1,
    sat?, sat_alpha, hue?, hue_delta, contrast_post?, alpha2]`` (flags are
    1.0/0.0; a flag set means the corresponding step — including the lossy
    HSV round-trip for saturation/hue — is applied)."""
    p = np.zeros(10, np.float32)
    if rng.randint(2):
        p[0] = 1.0
        p[1] = rng.uniform(-brightness_delta, brightness_delta)
    mode = rng.randint(2)
    if mode == 1 and rng.randint(2):
        p[2] = 1.0
        p[3] = rng.uniform(*contrast_range)
    if rng.randint(2):
        p[4] = 1.0
        p[5] = rng.uniform(*saturation_range)
    if rng.randint(2):
        p[6] = 1.0
        p[7] = rng.randint(-hue_delta, hue_delta)
    if mode == 0 and rng.randint(2):
        p[8] = 1.0
        p[9] = rng.uniform(*contrast_range)
    return p


def normalize_clip(
    imgs: list[np.ndarray],
    mean: np.ndarray = IMG_MEAN,
    std: np.ndarray = IMG_STD,
    to_rgb: bool = True,
) -> list[np.ndarray]:
    """mmcv imnormalize: optional BGR→RGB then (x − mean)/std, f32.

    Uses the native fused single-pass kernel when the C++ lib is built
    (three numpy passes otherwise).
    """
    from .. import native

    if native.available() and imgs and imgs[0].dtype == np.uint8:
        return [native.normalize_f32(im, mean, std, to_rgb) for im in imgs]
    out = []
    for im in imgs:
        im = im.astype(np.float32)
        if to_rgb:
            im = im[..., ::-1]
        out.append((im - mean) / std)
    return out


def pad_clip(
    imgs: list[np.ndarray],
    segs: list[np.ndarray] | None,
    size: tuple[int, int],
    pad_val: float = 0.0,
    seg_pad_val: int = 255,
) -> tuple[list[np.ndarray], list[np.ndarray] | None]:
    """Bottom/right pad to fixed size (``Pad_clips``, reference ``:990``)."""
    th, tw = size

    def pad_img(im, val):
        ph, pw = max(th - im.shape[0], 0), max(tw - im.shape[1], 0)
        if ph == 0 and pw == 0:
            return im
        widths = [(0, ph), (0, pw)] + [(0, 0)] * (im.ndim - 2)
        return np.pad(im, widths, constant_values=val)

    imgs = [pad_img(im, pad_val) for im in imgs]
    if segs is not None:
        segs = [pad_img(s, seg_pad_val) for s in segs]
    return imgs, segs


def aligned_resize_clip(
    imgs: list[np.ndarray],
    segs: list[np.ndarray] | None = None,
    img_scale: tuple[int, int] = (853, 480),
    size_divisor: int = 32,
) -> tuple[list[np.ndarray], list[np.ndarray] | None]:
    """Eval resize: keep-ratio rescale to (853, 480) then *rescale* (not pad)
    both sides up to /32 multiples (``AlignedResize_clips._align:382-389``)."""

    def align(im, nearest=False):
        im = imrescale(im, img_scale, nearest=nearest)
        ah = int(np.ceil(im.shape[0] / size_divisor)) * size_divisor
        aw = int(np.ceil(im.shape[1] / size_divisor)) * size_divisor
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        return cv2.resize(im, (aw, ah), interpolation=interp)

    imgs = [align(im) for im in imgs]
    if segs is not None:
        segs = [align(s, nearest=True) for s in segs]
    return imgs, segs
