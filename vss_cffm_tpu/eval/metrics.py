"""Evaluation metrics: confusion matrix, mIoU/FWIoU/acc, VC score.

Parity with the reference metric stack
(``mmseg/core/evaluation/metrics.py`` and ``VC_perclip.py``):

- ``update_confusion`` replaces the reference's per-frame numpy histogram +
  CPU pickle gather (``apis/test.py:169-243``) with an **on-device**
  scatter-add confusion matrix; across a mesh the (C, C) matrix psums over
  ICI, so no raw masks ever leave the device.
- ``Evaluator`` semantics (``metrics.py:6-58``): ``mean_iou_seen`` masks the
  mean to classes that appear in the ground truth (``:25-31``); ``fwiou``
  (``:33-40``).
- ``eval_metrics`` (``metrics.py:300-351``): aAcc / per-class Acc / IoU with
  nan for absent classes.
- ``video_consistency``: VC_n (``VC_perclip.py:64-80``) — for every run of n
  consecutive frames, the fraction of pixels whose GT is static across the
  run whose prediction is also static across the run (no correctness
  requirement — matching the reference exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "update_confusion",
    "confusion_matrix_np",
    "aggregate_confusion",
    "eval_metrics",
    "format_class_table",
    "mean_iou_seen",
    "fwiou",
    "video_consistency",
]


def _split_int64(cm: np.ndarray) -> np.ndarray:
    """(C, C) int64 → (2, C, C) int32 [hi, lo] base-2³¹ digits (non-negative
    counts < 2⁶² by construction). TPU/JAX default to 32-bit, so cross-process
    gathers move int32 and the exact int64 is rebuilt on host."""
    cm = np.asarray(cm, np.int64)
    return np.stack([(cm >> 31).astype(np.int32), (cm & ((1 << 31) - 1)).astype(np.int32)])


def _merge_int64(parts: np.ndarray) -> np.ndarray:
    """(..., 2, C, C) int32 → summed (C, C) int64 over all leading axes."""
    parts = np.asarray(parts, np.int64)
    hi, lo = parts[..., 0, :, :], parts[..., 1, :, :]
    total = (hi << 31) + lo
    return total.reshape((-1,) + total.shape[-2:]).sum(0)


def aggregate_confusion(cm: np.ndarray) -> np.ndarray:
    """Sum local (C, C) confusion matrices across JAX processes.

    Replaces the reference's pickle-gather of raw per-frame masks
    (``apis/test.py:107-243``): each process evaluates its frame shard into a
    local matrix; one tiny all-gather of the (2, C, C) int32 digit split over
    ICI/DCN yields identical global metrics on every process. Identity when
    single-process.
    """
    if jax.process_count() == 1:
        return np.asarray(cm, np.int64)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(_split_int64(cm))  # (P, 2, C, C)
    return _merge_int64(np.asarray(gathered))


def update_confusion(
    confusion: jnp.ndarray,  # (C, C) int64/float64 accumulator, gt-major
    pred: jnp.ndarray,  # (...,) int predicted labels
    label: jnp.ndarray,  # (...,) int gt labels (ignore >= C)
    num_classes: int,
) -> jnp.ndarray:
    """Scatter-add (gt, pred) pairs; invalid labels routed to a dropped bin."""
    valid = (label >= 0) & (label < num_classes)
    flat = jnp.where(valid, label * num_classes + pred, num_classes * num_classes)
    counts = jnp.zeros(num_classes * num_classes + 1, confusion.dtype)
    counts = counts.at[flat.reshape(-1)].add(1)
    return confusion + counts[:-1].reshape(num_classes, num_classes)


def confusion_matrix_np(pred: np.ndarray, label: np.ndarray, num_classes: int) -> np.ndarray:
    """Reference ``Evaluator._generate_matrix`` (numpy, host-side)."""
    mask = (label >= 0) & (label < num_classes)
    idx = num_classes * label[mask].astype(np.int64) + pred[mask].astype(np.int64)
    return np.bincount(idx, minlength=num_classes**2).reshape(num_classes, num_classes)


def _iou_from_confusion(cm: np.ndarray) -> np.ndarray:
    inter = np.diag(cm)
    union = cm.sum(1) + cm.sum(0) - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return inter / union


def eval_metrics(cm: np.ndarray) -> dict[str, np.ndarray | float]:
    """mmseg-style summary: aAcc, per-class Acc, per-class IoU, mIoU/mAcc."""
    cm = np.asarray(cm, np.float64)
    inter = np.diag(cm)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = inter / cm.sum(1)
    iou = _iou_from_confusion(cm)
    return {
        "aAcc": float(inter.sum() / cm.sum()) if cm.sum() else float("nan"),
        "Acc": acc,
        "IoU": iou,
        "mIoU": float(np.nanmean(iou)),
        "mAcc": float(np.nanmean(acc)),
    }


def _ascii_table(rows: list[list[str]]) -> str:
    """Grid-style ASCII table (the reference prints per-class results via
    terminaltables.AsciiTable, ``custom.py:2700-2705`` — same shape, no dep)."""
    widths = [max(len(str(r[c])) for r in rows) for c in range(len(rows[0]))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep]
    for i, row in enumerate(rows):
        out.append("| " + " | ".join(str(v).ljust(w) for v, w in zip(row, widths)) + " |")
        if i == 0:
            out.append(sep)
    out.append(sep)
    return "\n".join(out)


def format_class_table(cm: np.ndarray, class_names=None) -> str:
    """Per-class IoU/Acc table + global summary (reference
    ``custom.py:2678-2709``): values ×100, 2 decimals, nan printed as nan."""
    m = eval_metrics(cm)
    n = cm.shape[0]
    names = class_names if class_names is not None else [str(i) for i in range(n)]

    def fmt(x: float) -> str:
        return "nan" if np.isnan(x) else f"{100.0 * x:.2f}"

    class_rows = [["Class", "IoU", "Acc"]]
    for i in range(n):
        class_rows.append([names[i], fmt(m["IoU"][i]), fmt(m["Acc"][i])])
    summary_rows = [
        ["Scope", "mIoU", "mAcc", "aAcc"],
        ["global", fmt(m["mIoU"]), fmt(m["mAcc"]), fmt(m["aAcc"])],
    ]
    return ("per class results:\n" + _ascii_table(class_rows)
            + "\nSummary:\n" + _ascii_table(summary_rows))


def mean_iou_seen(cm: np.ndarray) -> float:
    """Reference Evaluator mIoU: mean over classes present in GT (``:25-31``)."""
    cm = np.asarray(cm, np.float64)
    iou = _iou_from_confusion(cm)
    seen = cm.sum(1) > 0
    if seen.sum() == 0:
        return float("nan")
    return float(np.nansum(iou * seen) / seen.sum())


def fwiou(cm: np.ndarray) -> float:
    """Frequency-weighted IoU (``:33-40``)."""
    cm = np.asarray(cm, np.float64)
    freq = cm.sum(1) / cm.sum()
    iou = _iou_from_confusion(cm)
    keep = freq > 0
    return float((freq[keep] * iou[keep]).sum())


def video_consistency(
    gts: list[np.ndarray], preds: list[np.ndarray], clip_num: int
) -> list[float]:
    """Per-window VC_n accuracies for one video (``VC_perclip.py:64-80``)."""
    accs = []
    for i in range(len(gts) - clip_num):
        gt_common = np.ones_like(gts[0], bool)
        pred_common = np.ones_like(gts[0], bool)
        for j in range(1, clip_num):
            gt_common &= gts[i] == gts[i + j]
            pred_common &= preds[i] == preds[i + j]
        hit = (pred_common & gt_common).sum()
        denom = gt_common.sum()
        accs.append(hit / denom if denom else np.nan)
    return accs
