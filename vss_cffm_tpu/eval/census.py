"""Eval-shape census: how many XLA compilations will an eval run trigger?

Every distinct (T, aligned H, aligned W, ori_shape) the evaluator sees
specialises the jitted forward once (SURVEY §7 "static shapes vs the
reference's dynamism"; VERDICT r1 weak #3). This module *measures* that set
up front from image headers alone — no decode, no device — so a run can
report its compile budget before paying it.

Findings this encodes (documented for the record):

- T is constant (``len(dilation) + 1``): the test sampler clamps
  out-of-range dilations at video starts (reference ``custom.py:2355-2445``)
  instead of shortening the clip, so early frames never change T.
- On VSPW (uniform 480p, one aspect ratio) the census is a single shape —
  one compile per run, or zero after the first run now that the CLIs enable
  the persistent compilation cache.
- TTA multiplies the census by ``len(ratios)`` (flips reuse shapes).
- Padding/bucketing is deliberately NOT applied: padded tokens would enter
  the SRA/CFM attention softmaxes and change predictions, breaking
  reference parity. For mixed-resolution datasets the mitigation is the
  persistent compile cache, not shape coercion.
"""

from __future__ import annotations

import math
from collections import Counter

from PIL import Image

from ..data.transforms import _rescale_factor

__all__ = ["eval_shape_census"]


def _aligned_hw(h0: int, w0: int, scale: tuple[int, int],
                divisor: int = 32) -> tuple[int, int]:
    f = _rescale_factor((h0, w0), scale)
    nh, nw = int(h0 * f + 0.5), int(w0 * f + 0.5)
    return (math.ceil(nh / divisor) * divisor, math.ceil(nw / divisor) * divisor)


def eval_shape_census(dataset, tta_ratios=None) -> dict:
    """Census of jit shapes for one eval pass over ``dataset``.

    Reads one image header per video (frames of a video share dimensions).
    Returns ``{"shapes": {(T, ah, aw, oh, ow): n_frames}, "num_compiles",
    "num_videos", "num_frames"}``.
    """
    ratios = list(tta_ratios) if tta_ratios else [1.0]
    t = len(dataset.dilation) + 1
    shapes: Counter = Counter()
    for video, frames in dataset.frames.items():
        with Image.open(dataset._img_path(video, frames[0])) as im:
            w0, h0 = im.size
        for r in ratios:
            scale = (int(dataset.img_scale[0] * r), int(dataset.img_scale[1] * r))
            ah, aw = _aligned_hw(h0, w0, scale)
            shapes[(t, ah, aw, h0, w0)] += len(frames)
    return {
        "shapes": dict(shapes),
        "num_compiles": len(shapes),
        "num_videos": len(dataset.frames),
        "num_frames": sum(len(f) for f in dataset.frames.values()),
    }
