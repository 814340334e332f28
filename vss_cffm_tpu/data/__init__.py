from .loader import TrainLoader, iterate_eval
from .palette import VSPW_CLASSES, VSPW_PALETTE
from .vspw import VSPWVideoDataset, load_label, reduce_zero_label

__all__ = [
    "TrainLoader",
    "iterate_eval",
    "VSPW_CLASSES",
    "VSPW_PALETTE",
    "VSPWVideoDataset",
    "load_label",
    "reduce_zero_label",
]
