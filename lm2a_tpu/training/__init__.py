from lm2a_tpu.training.adan import adan, AdanState, flat_adan, make_lr_schedule
from lm2a_tpu.training.checkpoint import (
    latest_checkpoint,
    list_checkpoints,
    load_metadata,
    restore_checkpoint,
    save_checkpoint,
)
from lm2a_tpu.training.loop import TrainResult, train
from lm2a_tpu.training.train_step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "adan",
    "AdanState",
    "flat_adan",
    "make_lr_schedule",
    "latest_checkpoint",
    "list_checkpoints",
    "load_metadata",
    "restore_checkpoint",
    "save_checkpoint",
    "TrainResult",
    "train",
    "TrainState",
    "init_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
]
