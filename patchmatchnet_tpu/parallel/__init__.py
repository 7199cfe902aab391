"""Device mesh construction and sharding policy.

The parallelism story (TPU-native replacement for the reference's
single-process torch.nn.DataParallel — reference: train.py:282, SURVEY §5.8):
a 1-D `data` mesh; batches are sharded over it, parameters replicated.
Gradient/batch-stat reductions become XLA collectives over ICI inserted
automatically by jit under these shardings.
"""

from patchmatchnet_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
