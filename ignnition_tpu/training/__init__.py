from .losses import get_loss
from .metrics import MetricAccumulator
from .optimizers import build_optimizer, build_schedule
from .trainer import Trainer, TrainState, restore_checkpoint, save_checkpoint, warm_start

__all__ = [
    "get_loss",
    "MetricAccumulator",
    "build_optimizer",
    "build_schedule",
    "Trainer",
    "TrainState",
    "restore_checkpoint",
    "save_checkpoint",
    "warm_start",
]
