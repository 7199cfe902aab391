"""Inference: batch depth/confidence export and depth fusion to point clouds."""

from patchmatchnet_tpu.infer.depth import DepthEstimator, ModuleEstimator, save_depth_maps
from patchmatchnet_tpu.infer.fusion import FusionConfig, filter_and_fuse

__all__ = ["DepthEstimator", "ModuleEstimator", "save_depth_maps", "FusionConfig", "filter_and_fuse"]
