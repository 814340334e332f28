from .loader import TrainLoader, iterate_eval, iterate_eval_tta, prefetch_map
from .palette import VSPW_CLASSES, VSPW_PALETTE, get_palette
from .vspw import VSPWVideoDataset, load_label, reduce_zero_label

__all__ = [
    "TrainLoader",
    "iterate_eval",
    "iterate_eval_tta",
    "prefetch_map",
    "VSPW_CLASSES",
    "VSPW_PALETTE",
    "get_palette",
    "VSPWVideoDataset",
    "load_label",
    "reduce_zero_label",
]
