"""Compute primitives: bilinear grid sampling, homography warping, regression.

Each op has a pure-jnp reference implementation (validated bit-close against
torch CPU in tests) and, where profitable, a Pallas TPU kernel with identical
semantics.
"""

from patchmatchnet_tpu.ops.grid_sample import grid_sample_2d
from patchmatchnet_tpu.ops.warp import differentiable_warp, warp_grid
from patchmatchnet_tpu.ops.regression import depth_regression
from patchmatchnet_tpu.ops.resize import (
    upsample_bilinear_x2,
    upsample_nearest_x2,
    resize_bilinear,
    downsample_nearest,
)

__all__ = [
    "depth_regression",
    "grid_sample_2d",
    "differentiable_warp",
    "warp_grid",
    "upsample_bilinear_x2",
    "upsample_nearest_x2",
    "resize_bilinear",
    "downsample_nearest",
]
