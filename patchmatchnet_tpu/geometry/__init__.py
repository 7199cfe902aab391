"""Shared camera/projection geometry for model + fusion (single source of
truth, unlike the reference's torch/numpy duplication)."""

from patchmatchnet_tpu.geometry.fusion_math import (
    backproject_to_world,
    check_geometric_consistency,
    reproject_with_depth,
)

__all__ = [
    "backproject_to_world",
    "check_geometric_consistency",
    "reproject_with_depth",
]
