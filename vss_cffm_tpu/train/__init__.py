from .checkpoint import CheckpointManager
from .optim import OptimConfig, build_optimizer, paramwise_multipliers, poly_schedule
from .state import TrainState
from .step import make_eval_step, make_train_step

__all__ = [
    "CheckpointManager",
    "OptimConfig",
    "build_optimizer",
    "paramwise_multipliers",
    "poly_schedule",
    "TrainState",
    "make_eval_step",
    "make_train_step",
]
