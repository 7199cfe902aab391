"""Resize helpers matching torch.nn.functional.interpolate semantics (NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest_x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample over the two spatial dims of [B, H, W, C]
    (torch F.interpolate(..., scale_factor=2, mode="nearest"))."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def downsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """1/factor nearest downsample of [B, H, W, C]
    (torch nearest picks input index floor(i * factor) == strided slice)."""
    return x[:, ::factor, ::factor, :]


def upsample_bilinear_x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, half-pixel centers (align_corners=False)."""
    b, h, w, c = x.shape
    return resize_bilinear(x, 2 * h, 2 * w)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers, matching torch
    F.interpolate(mode="bilinear", align_corners=False) / cv2.INTER_LINEAR.

    Implemented as two separable matmuls (TPU/MXU friendly) instead of gathers.
    """
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    hi = jax.lax.Precision.HIGHEST
    mat_h = _interp_matrix(h, out_h, x.dtype)  # [out_h, h]
    mat_w = _interp_matrix(w, out_w, x.dtype)  # [out_w, w]
    # [B,H,W,C] -> [B,out_h,W,C]
    x = jnp.einsum("oh,bhwc->bowc", mat_h, x, precision=hi)
    # -> [B,out_h,out_w,C]
    return jnp.einsum("pw,bhwc->bhpc", mat_w, x, precision=hi)


def _interp_matrix(in_size: int, out_size: int, dtype) -> jnp.ndarray:
    """Sparse-ish [out, in] bilinear interpolation matrix, half-pixel centers.

    torch clamps source coordinates at the low end (src >= 0) and relies on
    weight==0 for the upper tap at the high end.
    """
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.maximum(src, 0.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.minimum(i0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    w0 = 1.0 - w1
    rows = jnp.arange(out_size)
    mat = jnp.zeros((out_size, in_size), jnp.float32)
    mat = mat.at[rows, i0].add(w0)
    mat = mat.at[rows, i1].add(w1)
    return mat.astype(dtype)
