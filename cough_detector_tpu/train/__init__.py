"""Training subsystem: steps, schedule, metrics, checkpointing, loop."""

from . import checkpoint, loop, metrics, schedule, steps
from .loop import train
from .metrics import EarlyStopping, EpochAccumulator
from .schedule import cosine_warm_restarts_lr, make_epoch_schedule
from .steps import (
    TrainState,
    compute_class_weights,
    create_train_state,
    eval_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
    train_step,
    weighted_cross_entropy,
)

__all__ = [
    "checkpoint", "loop", "metrics", "schedule", "steps", "train",
    "EarlyStopping", "EpochAccumulator", "cosine_warm_restarts_lr",
    "make_epoch_schedule", "TrainState", "compute_class_weights",
    "create_train_state", "eval_step", "make_eval_step", "make_optimizer",
    "make_train_step", "train_step", "weighted_cross_entropy",
]
