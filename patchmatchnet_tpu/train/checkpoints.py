"""Orbax checkpoint backend (optional, alongside the msgpack format).

The msgpack path (train.loop.save_train_checkpoint) is the portable default;
this module provides orbax-backed checkpoints for production training:
atomic directory commits, async-capable saving, and restoration onto sharded
array trees (SURVEY §5.4's orbax-style checkpointing).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from patchmatchnet_tpu.train.loop import TrainState


def save_orbax_checkpoint(directory: str, state: TrainState, epoch: int) -> None:
    """Save a TrainState into `directory` (an orbax checkpoint dir)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    payload = {
        "epoch": np.asarray(epoch, np.int32),
        "state": jax.tree.map(np.asarray, state),
    }
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(directory, payload, force=True)


def load_orbax_checkpoint(directory: str, template: TrainState) -> Tuple[TrainState, int]:
    """Restore a TrainState saved by save_orbax_checkpoint.

    `template` provides the tree structure/dtypes (e.g. a freshly created
    state); returns (state, epoch).
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    target = {
        "epoch": np.asarray(0, np.int32),
        "state": jax.tree.map(np.asarray, template),
    }
    with ocp.StandardCheckpointer() as checkpointer:
        restored = checkpointer.restore(directory, target)
    return restored["state"], int(restored["epoch"])


def find_latest_orbax_checkpoint(folder: str, prefix: str = "orbax_") -> Optional[str]:
    """Latest orbax checkpoint directory under `folder` by epoch number."""
    if not os.path.isdir(folder):
        return None
    candidates = [
        d
        for d in os.listdir(folder)
        if d.startswith(prefix) and os.path.isdir(os.path.join(folder, d))
    ]
    if not candidates:
        return None
    candidates.sort(key=lambda d: int(d[len(prefix):]))
    return os.path.join(folder, candidates[-1])
