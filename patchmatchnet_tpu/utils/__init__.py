"""Metrics, meters, and logging utilities."""

from patchmatchnet_tpu.utils.metrics import (
    DictAverageMeter,
    absolute_depth_error,
    threshold_error,
)

__all__ = ["DictAverageMeter", "absolute_depth_error", "threshold_error"]
