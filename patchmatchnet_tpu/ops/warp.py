"""Differentiable homography warping — the hot inner op of PatchMatch evaluation.

Semantics match the reference warp (reference: models/module.py:130-181):
backproject the reference pixel grid at D depth hypotheses, project into the
source view, guard against non-positive depths by pushing samples off-image,
then bilinearly sample source features with align_corners=True / zeros
padding. The sampling grid carries no gradient (the reference computes it
under torch.no_grad()); gradients flow only through the sampled features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from patchmatchnet_tpu.ops.grid_sample import grid_sample_2d
from patchmatchnet_tpu.ops.quad_sample import (
    QuadImage,
    _gather_rows,
    quad_coords,
    quad_sample,
)


def warp_grid(
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_samples: jnp.ndarray,
    src_height: int,
    src_width: int,
) -> jnp.ndarray:
    """Compute normalized sampling positions in the source image.

    Args:
        src_proj: [B, 4, 4] source projection (K @ E embedded in 4x4).
        ref_proj: [B, 4, 4] reference projection.
        depth_samples: [B, D, H, W] depth hypotheses on the reference grid.
        src_height, src_width: source feature map size (for normalization and
            the off-image push of invalid samples).

    Returns:
        grid: [B, D, H, W, 2] normalized (x, y) in align_corners=True convention.
    """
    batch, num_depth, height, width = depth_samples.shape

    # Camera math must stay in full f32 even on TPU (default matmul precision
    # is bf16-ish there and costs ~0.1 px of sampling accuracy).
    hi = jax.lax.Precision.HIGHEST
    proj = jnp.matmul(src_proj, jnp.linalg.inv(ref_proj), precision=hi)
    rot = proj[:, :3, :3]  # [B,3,3]
    trans = proj[:, :3, 3]  # [B,3]

    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=depth_samples.dtype),
        jnp.arange(width, dtype=depth_samples.dtype),
        indexing="ij",
    )
    xyz = jnp.stack([x.ravel(), y.ravel(), jnp.ones(height * width, depth_samples.dtype)])

    rot_xyz = jnp.matmul(rot, xyz, precision=hi)  # [B, 3, H*W]
    # [B, 3, D, H*W] = ray direction * depth + translation
    proj_xyz = rot_xyz[:, :, None, :] * depth_samples.reshape(
        batch, 1, num_depth, height * width
    ) + trans[:, :, None, None]

    # Guard: samples behind the source camera are pushed off-image so the
    # zeros-padded bilinear tap returns 0.
    negative = proj_xyz[:, 2:3] <= 1e-3
    px = jnp.where(negative[:, 0], jnp.asarray(float(src_width), proj_xyz.dtype), proj_xyz[:, 0])
    py = jnp.where(negative[:, 0], jnp.asarray(float(src_height), proj_xyz.dtype), proj_xyz[:, 1])
    pz = jnp.where(negative[:, 0], jnp.asarray(1.0, proj_xyz.dtype), proj_xyz[:, 2])

    gx = px / pz / ((src_width - 1) / 2.0) - 1.0
    gy = py / pz / ((src_height - 1) / 2.0) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)  # [B, D, H*W, 2]
    return jax.lax.stop_gradient(grid.reshape(batch, num_depth, height, width, 2))


def differentiable_warp(
    src_fea: jnp.ndarray,
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_samples: jnp.ndarray,
) -> jnp.ndarray:
    """Warp source features onto the reference view at each depth hypothesis.

    Args:
        src_fea: [B, H, W, C] source features (NHWC).
        src_proj / ref_proj: [B, 4, 4] projection matrices.
        depth_samples: [B, D, H, W] depth hypotheses.

    Returns:
        [B, D, H, W, C] warped source features.
    """
    src_h, src_w = src_fea.shape[1], src_fea.shape[2]
    grid = warp_grid(src_proj, ref_proj, depth_samples, src_h, src_w)
    return grid_sample_2d(src_fea, grid, align_corners=True, padding_mode="zeros")


def warp_pixel_coords(
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_samples: jnp.ndarray,
    src_height: int,
    src_width: int,
):
    """Unnormalized source-pixel sample coordinates for the warp.

    Returns (ix, iy) [B, D, H, W] f32 in align_corners=True pixel units
    (off-image for behind-camera samples, unclamped). For the windowed
    sampling kernel (ops/pallas/windowed_similarity.py).
    """
    grid = warp_grid(src_proj, ref_proj, depth_samples, src_height, src_width)
    ix = (grid[..., 0] + 1.0) * 0.5 * (src_width - 1)
    iy = (grid[..., 1] + 1.0) * 0.5 * (src_height - 1)
    return ix, iy


def warp_proj_coeffs(src_proj: jnp.ndarray, ref_proj: jnp.ndarray) -> jnp.ndarray:
    """[B, 12] f32 row-major (src_proj @ inv(ref_proj))[:, :3, :4] — the
    per-sample warp is then ix = px/pz, p = R [u, v, 1]^T * depth + t (the
    windowed sampler computes this in-kernel; reference: module.py:148)."""
    hi = jax.lax.Precision.HIGHEST
    proj = jnp.matmul(src_proj, jnp.linalg.inv(ref_proj), precision=hi)
    b = proj.shape[0]
    return jax.lax.stop_gradient(
        proj[:, :3, :4].reshape(b, 12).astype(jnp.float32)
    )


def warp_coords(
    src_quad: "QuadImage",
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_samples: jnp.ndarray,
    pad_to: int = 1,
):
    """Quad-table gather coordinates for the warp, without gathering.

    Returns (idx [B, P'] int32 rows into src_quad.data, w4 [B, 4, P'] f32
    bilinear tap weights, hwp) with P' = D * hwp ordered (d, h, w), where
    hwp is H*W rounded up to a multiple of `pad_to`.
    """
    batch, num_depth, height, width = depth_samples.shape
    hw = height * width
    hwp = -(-hw // pad_to) * pad_to
    grid = warp_grid(src_proj, ref_proj, depth_samples, src_quad.height, src_quad.width)
    grid2 = grid.reshape(batch, -1, 2)
    ix = (grid2[..., 0] + 1.0) * 0.5 * (src_quad.width - 1)
    iy = (grid2[..., 1] + 1.0) * 0.5 * (src_quad.height - 1)
    if hwp != hw:
        padw = ((0, 0), (0, 0), (0, hwp - hw))
        ix = jnp.pad(ix.reshape(batch, num_depth, hw), padw).reshape(batch, -1)
        iy = jnp.pad(iy.reshape(batch, num_depth, hw), padw).reshape(batch, -1)
    # Bilinear weights stay f32 even when the feature payload is bf16:
    # sub-pixel positions carry the depth signal and bf16 weights cost
    # measurable depth accuracy (see PROGRESS.md round-2 precision table).
    idx, w4 = quad_coords(
        src_quad, ix, iy, padding_mode="zeros", weight_dtype=jnp.float32
    )
    return idx, w4, hwp


def warp_taps(
    src_quad: "QuadImage",
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_samples: jnp.ndarray,
    pad_to: int = 1,
):
    """Gather the 2x2 warp taps without combining them.

    Returns (taps [B, P', 4C], w4 [B, 4, P'], hwp) with P' = D * hwp ordered
    (d, h, w), where hwp is H*W rounded up to a multiple of `pad_to`
    (padding COORDINATES before the gather is free compared to re-copying
    the wide taps array afterwards). For the fused similarity kernel
    (ops/pallas/similarity_kernel.py).
    """
    idx, w4, hwp = warp_coords(src_quad, src_proj, ref_proj, depth_samples, pad_to)
    taps = _gather_rows(src_quad, idx)
    return taps, w4, hwp


def warp_quad(
    src_quad: "QuadImage",
    src_proj: jnp.ndarray,
    ref_proj: jnp.ndarray,
    depth_samples: jnp.ndarray,
) -> jnp.ndarray:
    """Like `differentiable_warp`, but sampling from a precomputed quad image
    (built once per source view and reused across taps/iterations).

    Returns [B, D, H, W, C].
    """
    batch, num_depth, height, width = depth_samples.shape
    grid = warp_grid(src_proj, ref_proj, depth_samples, src_quad.height, src_quad.width)
    grid2 = grid.reshape(batch, -1, 2)
    # align_corners=True unnormalization (matches grid_sample_2d)
    ix = (grid2[..., 0] + 1.0) * 0.5 * (src_quad.width - 1)
    iy = (grid2[..., 1] + 1.0) * 0.5 * (src_quad.height - 1)
    out = quad_sample(src_quad, ix, iy, padding_mode="zeros")
    return out.reshape(batch, num_depth, height, width, src_quad.channels)
