"""Dataset layer: unified MVS scene index, sample loading, batching, prefetch."""

from patchmatchnet_tpu.data.dtu_legacy import DTULegacyDataset
from patchmatchnet_tpu.data.mvs import (
    BatchLoader,
    MVSDataset,
    adjust_dims_multiple_of_8,
    adjust_sample_dims,
)

__all__ = [
    "BatchLoader",
    "DTULegacyDataset",
    "MVSDataset",
    "adjust_dims_multiple_of_8",
    "adjust_sample_dims",
]
