from .evaluator import ClipEvaluator, save_pred_png
from .metrics import (
    confusion_matrix_np,
    eval_metrics,
    fwiou,
    mean_iou_seen,
    update_confusion,
    video_consistency,
)
from .prototypes import ClusterStore, generate_prototypes

__all__ = [
    "ClipEvaluator",
    "save_pred_png",
    "confusion_matrix_np",
    "eval_metrics",
    "fwiou",
    "mean_iou_seen",
    "update_confusion",
    "video_consistency",
    "ClusterStore",
    "generate_prototypes",
]
