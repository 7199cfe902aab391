"""Model family: PatchmatchNet and its submodules."""

from patchmatchnet_tpu.models.feature import FeatureNet
from patchmatchnet_tpu.models.net import PatchmatchNet, patchmatchnet_loss, smooth_l1_loss
from patchmatchnet_tpu.models.patchmatch import (
    Evaluation,
    FeatureWeightNet,
    PatchMatch,
    PixelwiseNet,
    SimilarityNet,
    build_offset_grid,
    depth_weight,
    init_perturbed_depth,
    init_random_depth,
    propagate,
)
from patchmatchnet_tpu.models.refinement import Refinement

__all__ = [
    "FeatureNet",
    "PatchmatchNet",
    "patchmatchnet_loss",
    "smooth_l1_loss",
    "Evaluation",
    "FeatureWeightNet",
    "PatchMatch",
    "PixelwiseNet",
    "SimilarityNet",
    "build_offset_grid",
    "depth_weight",
    "init_perturbed_depth",
    "init_random_depth",
    "propagate",
    "Refinement",
]
