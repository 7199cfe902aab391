"""Quad-image bilinear sampling: one gather index fetches all four taps.

TPU gathers cost per-index, not per-byte, until the payload approaches lane
width. Standard bilinear sampling spends 4 gather indices per point. Here we
precompute a "quad image" Q[i] = concat(F[i], F[i+1], F[i+W], F[i+W+1]) over
the flattened (optionally zero-ring-padded) feature map, so a single gather
of Q yields the full 2x2 neighborhood — 4x fewer indices for the same exact
bilinear result (validated bit-exact against the 4-tap formulation).

The quad image is built once per (feature map, padding mode) and reused by
every sampling pass against it (all taps, all PatchMatch iterations).

All gathers use promise_in_bounds: indices are clamped on construction, so
XLA's default fill-mode select over the (wide) gather output is avoided.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class QuadImage(NamedTuple):
    """Precomputed 2x2-neighborhood feature table.

    data: [B, rows, 4C] where rows = (H+2)*(W+2) for zeros mode (one-pixel
          zero ring) or H*W for border mode.
    height/width: original feature dims. channels: C. padded: zeros-ring flag.
    """

    data: jnp.ndarray
    height: int
    width: int
    channels: int
    padded: bool


def make_quad_image(image: jnp.ndarray, padding_mode: str) -> QuadImage:
    """Build the quad table for [B, H, W, C] features.

    zeros mode pads a one-pixel zero ring so out-of-bounds taps read zeros;
    border mode needs no ring (sampling coordinates are pre-clamped).
    """
    b, h, w, c = image.shape
    if padding_mode == "zeros":
        img = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
        wp = w + 2
        flat = img.reshape(b, (h + 2) * wp, c)
        padded = True
    elif padding_mode == "border":
        wp = w
        flat = image.reshape(b, h * w, c)
        padded = False
    else:
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    quad = jnp.concatenate(
        [
            flat,
            jnp.roll(flat, -1, axis=1),
            jnp.roll(flat, -wp, axis=1),
            jnp.roll(flat, -wp - 1, axis=1),
        ],
        axis=-1,
    )
    return QuadImage(quad, h, w, c, padded)


def quad_coords(
    quad: QuadImage,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    *,
    padding_mode: str,
    weight_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute gather rows + the 4 bilinear tap weights.

    Args:
        ix / iy: [B, P] unnormalized pixel coordinates.
    Returns:
        (idx [B, P] int32 — always in-bounds of quad.data rows,
         w4 [B, 4, P] tap weights (tap-major so the array is lane-dense —
         a [P, 4] layout would tile 4 -> 128 lanes), zeroed for invalid
         taps in zeros mode).
    """
    h, w = quad.height, quad.width
    dtype = weight_dtype or quad.data.dtype

    if padding_mode == "border":
        assert not quad.padded
        x0 = jnp.clip(jnp.floor(ix), 0, w - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(iy), 0, h - 2).astype(jnp.int32)
        wx = (ix - x0).astype(dtype)
        wy = (iy - y0).astype(dtype)
        idx = y0 * w + x0
        w4 = jnp.stack(
            [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=1
        )
        return idx, w4

    assert quad.padded
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    wx = (ix - x0f).astype(dtype)
    wy = (iy - y0f).astype(dtype)
    # validity of each tap against the ORIGINAL image bounds
    x0v = ((x0f >= 0) & (x0f <= w - 1)).astype(dtype)
    x1v = ((x0f >= -1) & (x0f <= w - 2)).astype(dtype)
    y0v = ((y0f >= 0) & (y0f <= h - 1)).astype(dtype)
    y1v = ((y0f >= -1) & (y0f <= h - 2)).astype(dtype)
    # clamp so the quad row index stays within the padded table
    x0 = jnp.clip(x0f, -1, w - 1).astype(jnp.int32)
    y0 = jnp.clip(y0f, -1, h - 1).astype(jnp.int32)
    idx = (y0 + 1) * (w + 2) + (x0 + 1)
    w4 = jnp.stack(
        [
            (1 - wx) * (1 - wy) * x0v * y0v,
            wx * (1 - wy) * x1v * y0v,
            (1 - wx) * wy * x0v * y1v,
            wx * wy * x1v * y1v,
        ],
        axis=1,
    )
    return idx, w4


def _gather_rows(quad: QuadImage, idx: jnp.ndarray) -> jnp.ndarray:
    """[B, P] indices -> [B, P, 4C] rows; indices promised in bounds."""
    return jnp.take_along_axis(
        quad.data, idx[..., None], axis=1, mode="promise_in_bounds"
    )


def quad_sample(
    quad: QuadImage,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    *,
    padding_mode: str,
) -> jnp.ndarray:
    """Bilinear sample at unnormalized pixel coords ix/iy [B, P] -> [B, P, C].

    Semantics identical to the 4-tap reference formulation (torch
    grid_sample): zeros mode masks out-of-bounds taps; border mode assumes
    coordinates pre-clamped to [0, size-1] and is exact at the high edge via
    the shifted-corner trick (x0 = min(floor(ix), W-2), wx = ix - x0).

    Weights and accumulation are always f32 (the payload may be bf16
    storage); the result is f32.
    """
    c = quad.channels
    idx, w4 = quad_coords(
        quad, ix, iy, padding_mode=padding_mode, weight_dtype=jnp.float32
    )
    taps = _gather_rows(quad, idx)  # [B, P, 4C], possibly bf16 storage
    # bf16 taps x f32 weights promote to f32 inside the fused combine (an
    # explicit astype here materializes a full [B, P, 4C] f32 convert).
    return (
        taps[..., 0 * c : 1 * c] * w4[:, 0, :, None]
        + taps[..., 1 * c : 2 * c] * w4[:, 1, :, None]
        + taps[..., 2 * c : 3 * c] * w4[:, 2, :, None]
        + taps[..., 3 * c : 4 * c] * w4[:, 3, :, None]
    )
