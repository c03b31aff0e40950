from .checkpoint import (
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
    save_model_checkpoint,
    save_train_state,
)
from .logging_utils import AverageMeter, Timer, setup_run_logging

__all__ = [
    "load_checkpoint",
    "restore_train_state",
    "save_checkpoint",
    "save_train_state",
    "AverageMeter",
    "Timer",
    "setup_run_logging",
]
