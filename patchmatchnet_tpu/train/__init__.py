"""Training: train state, jitted train/eval steps, LR schedule, checkpoints."""

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
