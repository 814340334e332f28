"""Streaming clip evaluation driver.

Replaces the reference test stack (``tools/test.py`` → ``apis/test.py`` →
``EncoderDecoder_clips.simple_test``, SURVEY §3.2):

- one clip per evaluated frame (dilation-clamped, early-frame schedules come
  from the dataset sampler);
- whole-image inference: logits → bilinear to network input size → bilinear
  to original shape → softmax → argmax (reference
  ``encoder_decoder.py:367-378, 502-552``);
- instead of spilling per-frame masks to .npy and pickle-gathering
  (``apis/test.py:143-243``), the (C, C) confusion matrix accumulates on
  device; host code only sees the final matrix plus (optionally) palette
  PNGs for ``format_results`` / offline VC scoring.

Static shapes: eval resolutions vary per video (AlignedResize), so the
jitted forward specialises per (T, H, W) — a bounded set on VSPW (480p) —
and results are cached by XLA's compile cache.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..data.palette import VSPW_PALETTE
from ..ops.resize import resize_bilinear
from .metrics import eval_metrics, fwiou, mean_iou_seen, update_confusion, video_consistency

__all__ = ["ClipEvaluator", "save_pred_png"]


def save_pred_png(pred: np.ndarray, path: str, palette=VSPW_PALETTE):
    """Palette PNG writer (``format_results``, ``custom.py:2525-2546``)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = Image.fromarray(pred.astype(np.uint8), mode="P")
    flat = [c for rgb in palette for c in rgb]
    img.putpalette(flat + [0] * (768 - len(flat)))
    img.save(path)


class ClipEvaluator:
    """Accumulates predictions into an on-device confusion matrix."""

    def __init__(self, model, params, batch_stats, num_classes: int,
                 cluster_store=None):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.num_classes = num_classes
        self.cluster_store = cluster_store
        self.confusion = jnp.zeros((num_classes, num_classes), jnp.int32)
        self._predict = jax.jit(self._predict_impl, static_argnames=("ori_shape",))
        self._vc_preds: dict[str, list[np.ndarray]] = defaultdict(list)
        self._vc_gts: dict[str, list[np.ndarray]] = defaultdict(list)

    def _predict_impl(self, imgs, ori_shape, cluster_centers=None):
        logits = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            imgs[None], False, cluster_centers,
        )  # (1, h/4, w/4, C)
        logits = resize_bilinear(logits, imgs.shape[1:3])
        logits = resize_bilinear(logits, ori_shape)
        prob = jax.nn.softmax(logits, axis=-1)
        return jnp.argmax(prob, axis=-1)[0]

    def predict(self, item: dict) -> np.ndarray:
        centers = None
        if self.cluster_store is not None:
            centers = jnp.asarray(self.cluster_store(item["video"]))[None]
        pred = self._predict(
            jnp.asarray(item["imgs"]), ori_shape=tuple(item["ori_shape"]),
            cluster_centers=centers,
        )
        return pred

    def add(self, item: dict, gt: np.ndarray, keep_for_vc: bool = False) -> np.ndarray:
        pred = self.predict(item)
        self.confusion = update_confusion(
            self.confusion, pred, jnp.asarray(gt.astype(np.int32)), self.num_classes
        )
        pred_np = np.asarray(pred)
        if keep_for_vc:
            self._vc_preds[item["video"]].append(pred_np.astype(np.uint8))
            self._vc_gts[item["video"]].append(gt.astype(np.int32))
        return pred_np

    def run(self, items: Iterable[dict], gt_fn: Callable[[int], np.ndarray] | None = None,
            dataset=None, keep_for_vc: bool = False, save_dir: str | None = None):
        for i, item in enumerate(items):
            gt = dataset.load_gt(i) if dataset is not None else gt_fn(i)
            pred = self.add(item, gt, keep_for_vc)
            if save_dir is not None:
                save_pred_png(pred, os.path.join(save_dir, item["video"],
                                                 item["frame"].rsplit(".", 1)[0] + ".png"))
        return self.summary(with_vc=keep_for_vc)

    def summary(self, with_vc: bool = False) -> dict:
        cm = np.asarray(self.confusion)
        out = eval_metrics(cm)
        out["mIoU_seen"] = mean_iou_seen(cm)
        out["FWIoU"] = fwiou(cm)
        if with_vc:
            for n, key in ((8, "VC8"), (16, "VC16")):
                accs = []
                for video, preds in self._vc_preds.items():
                    gts = self._vc_gts[video]
                    if len(gts) <= n:
                        continue
                    accs.extend(video_consistency(gts, preds, n))
                out[key] = float(np.nanmean(accs)) if accs else float("nan")
        return out
