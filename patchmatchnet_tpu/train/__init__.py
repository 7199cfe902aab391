"""Training: train state, jitted train/eval steps, LR schedule, checkpoints."""

from patchmatchnet_tpu.train.checkpoints import (
    find_latest_orbax_checkpoint,
    load_orbax_checkpoint,
    save_orbax_checkpoint,
)
from patchmatchnet_tpu.train.loop import (
    TrainState,
    build_stage_pyramid,
    create_train_state,
    find_latest_checkpoint,
    load_train_checkpoint,
    make_eval_step,
    make_optimizer,
    make_train_step,
    multistep_lr,
    save_train_checkpoint,
)

__all__ = [
    "find_latest_orbax_checkpoint",
    "load_orbax_checkpoint",
    "save_orbax_checkpoint",
    "TrainState",
    "build_stage_pyramid",
    "create_train_state",
    "find_latest_checkpoint",
    "load_train_checkpoint",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "multistep_lr",
    "save_train_checkpoint",
]
