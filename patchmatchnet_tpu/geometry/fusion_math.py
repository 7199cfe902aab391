"""Geometric-consistency math for depth fusion, vectorized in jax.numpy.

Semantics match the reference fusion pipeline (reference: eval.py:86-190):
project reference pixels into a source view, sample the source depth
bilinearly (cv2.remap INTER_LINEAR convention: pixel-coordinate bilinear
with zero border), project back, and compare reprojection distance and
relative depth difference. Runs on device (or CPU) over whole images,
replacing the reference's per-view serial numpy/cv2 loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _hi():
    return jax.lax.Precision.HIGHEST


def _pixel_grid(height: int, width: int, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    return x, y


def _sample_bilinear_pixel(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample `img` [H, W] at pixel coords (x, y) [..., ], zero
    outside (cv2.remap INTER_LINEAR + BORDER_CONSTANT 0 convention)."""
    h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc] * valid.astype(img.dtype)

    return (
        tap(y0i, x0i) * (1 - wx) * (1 - wy)
        + tap(y0i, x0i + 1) * wx * (1 - wy)
        + tap(y0i + 1, x0i) * (1 - wx) * wy
        + tap(y0i + 1, x0i + 1) * wx * wy
    )


def reproject_with_depth(
    depth_ref: jnp.ndarray,
    intrinsics_ref: jnp.ndarray,
    extrinsics_ref: jnp.ndarray,
    depth_src: jnp.ndarray,
    intrinsics_src: jnp.ndarray,
    extrinsics_src: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference->source->reference round trip (reference: eval.py:86-145).

    Args: depth maps [H, W]; intrinsics [3, 3]; extrinsics [4, 4].
    Returns (depth_reprojected, x_reprojected, y_reprojected), each [H, W].
    """
    dtype = depth_ref.dtype
    height, width = depth_ref.shape
    x_ref, y_ref = _pixel_grid(height, width, dtype)
    ones = jnp.ones_like(x_ref)

    # reference pixels -> reference camera space
    uv1 = jnp.stack([x_ref, y_ref, ones]).reshape(3, -1)  # [3, HW]
    xyz_ref = jnp.matmul(
        jnp.linalg.inv(intrinsics_ref), uv1 * depth_ref.reshape(1, -1), precision=_hi()
    )
    # -> source camera space
    rel = jnp.matmul(
        extrinsics_src, jnp.linalg.inv(extrinsics_ref), precision=_hi()
    )
    xyz_src = jnp.matmul(
        rel, jnp.concatenate([xyz_ref, ones.reshape(1, -1)]), precision=_hi()
    )[:3]
    k_xyz_src = jnp.matmul(intrinsics_src, xyz_src, precision=_hi())
    xy_src = k_xyz_src[:2] / k_xyz_src[2:3]

    # sample source depth at projected positions
    x_src = xy_src[0].reshape(height, width)
    y_src = xy_src[1].reshape(height, width)
    sampled_depth_src = _sample_bilinear_pixel(depth_src, x_src, y_src)

    # back to reference view using the sampled source depth
    xyz_src2 = jnp.matmul(
        jnp.linalg.inv(intrinsics_src),
        jnp.concatenate([xy_src, ones.reshape(1, -1)])
        * sampled_depth_src.reshape(1, -1),
        precision=_hi(),
    )
    rel_back = jnp.matmul(
        extrinsics_ref, jnp.linalg.inv(extrinsics_src), precision=_hi()
    )
    xyz_reproj = jnp.matmul(
        rel_back, jnp.concatenate([xyz_src2, ones.reshape(1, -1)]), precision=_hi()
    )[:3]

    depth_reprojected = xyz_reproj[2].reshape(height, width)
    k_xyz_reproj = jnp.matmul(intrinsics_ref, xyz_reproj, precision=_hi())
    xy_reproj = k_xyz_reproj[:2] / k_xyz_reproj[2:3]
    x_reproj = xy_reproj[0].reshape(height, width)
    y_reproj = xy_reproj[1].reshape(height, width)
    return depth_reprojected, x_reproj, y_reproj


def check_geometric_consistency(
    depth_ref: jnp.ndarray,
    intrinsics_ref: jnp.ndarray,
    extrinsics_ref: jnp.ndarray,
    depth_src: jnp.ndarray,
    intrinsics_src: jnp.ndarray,
    extrinsics_src: jnp.ndarray,
    geo_pixel_thres: float,
    geo_depth_thres: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask of pixels consistent with one source view + their reprojected
    depths (reference: eval.py:148-190). Returns (mask [H, W] bool,
    depth_reprojected [H, W] with inconsistent pixels zeroed)."""
    height, width = depth_ref.shape
    x_ref, y_ref = _pixel_grid(height, width, depth_ref.dtype)
    depth_reproj, x2d, y2d = reproject_with_depth(
        depth_ref, intrinsics_ref, extrinsics_ref,
        depth_src, intrinsics_src, extrinsics_src,
    )
    dist = jnp.sqrt((x2d - x_ref) ** 2 + (y2d - y_ref) ** 2)
    depth_diff = jnp.abs(depth_reproj - depth_ref)
    relative = depth_diff / depth_ref
    mask = (dist < geo_pixel_thres) & (relative < geo_depth_thres)
    return mask, jnp.where(mask, depth_reproj, 0.0)


def backproject_to_world(
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
) -> jnp.ndarray:
    """Backproject a full depth map to world coordinates.

    Returns [H, W, 3] world points (reference: eval.py:278-279 per-pixel).
    """
    height, width = depth.shape
    x, y = _pixel_grid(height, width, depth.dtype)
    uv1 = jnp.stack([x, y, jnp.ones_like(x)]).reshape(3, -1)
    xyz_cam = jnp.matmul(
        jnp.linalg.inv(intrinsics), uv1 * depth.reshape(1, -1), precision=_hi()
    )
    cam_to_world = jnp.linalg.inv(extrinsics)
    xyz_world = jnp.matmul(
        cam_to_world,
        jnp.concatenate([xyz_cam, jnp.ones((1, xyz_cam.shape[1]), depth.dtype)]),
        precision=_hi(),
    )[:3]
    return jnp.transpose(xyz_world).reshape(height, width, 3)
