"""Quad-image bilinear sampling: one gather index fetches all four taps.

TPU gathers cost per-index, not per-byte, until the payload approaches lane
width. Standard bilinear sampling spends 4 gather indices per point. Here we
precompute a "quad image" Q[i] = concat(F[i], F[i+1], F[i+W], F[i+W+1]) over
the flattened (optionally zero-ring-padded) feature map, so a single gather
of Q yields the full 2x2 neighborhood — 4x fewer indices for the same exact
bilinear result (validated bit-exact against the 4-tap formulation).

The quad image is built once per (feature map, padding mode) and reused by
every sampling pass against it (all taps, all PatchMatch iterations).
"""

from __future__ import annotations

from typing import NamedTuple

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


def quad_sample(
    quad: QuadImage,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    *,
    padding_mode: str,
) -> jnp.ndarray:
    """Bilinear sample at unnormalized pixel coords ix/iy [B, P].

    Semantics identical to the 4-tap reference formulation (torch
    grid_sample): zeros mode masks out-of-bounds taps; border mode assumes
    coordinates pre-clamped to [0, size-1] and is exact at the high edge via
    the shifted-corner trick (x0 = min(floor(ix), W-2), wx = ix - x0).
    """
    h, w, c = quad.height, quad.width, quad.channels
    b, p = ix.shape
    dtype = quad.data.dtype

    if padding_mode == "border":
        assert not quad.padded
        x0 = jnp.minimum(jnp.floor(ix), w - 2).astype(jnp.int32)
        y0 = jnp.minimum(jnp.floor(iy), h - 2).astype(jnp.int32)
        x0 = jnp.maximum(x0, 0)
        y0 = jnp.maximum(y0, 0)
        wx = (ix - x0).astype(dtype)[..., None]
        wy = (iy - y0).astype(dtype)[..., None]
        idx = y0 * w + x0
        w00 = (1 - wx) * (1 - wy)
        w01 = wx * (1 - wy)
        w10 = (1 - wx) * wy
        w11 = wx * wy
    else:
        assert quad.padded
        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        wx = (ix - x0f).astype(dtype)[..., None]
        wy = (iy - y0f).astype(dtype)[..., None]
        # validity of each tap against the ORIGINAL image bounds
        x0v = ((x0f >= 0) & (x0f <= w - 1)).astype(dtype)[..., None]
        x1v = ((x0f >= -1) & (x0f <= w - 2)).astype(dtype)[..., None]
        y0v = ((y0f >= 0) & (y0f <= h - 1)).astype(dtype)[..., None]
        y1v = ((y0f >= -1) & (y0f <= h - 2)).astype(dtype)[..., None]
        # clamp so the quad row index stays within the padded table
        x0 = jnp.clip(x0f, -1, w - 1).astype(jnp.int32)
        y0 = jnp.clip(y0f, -1, h - 1).astype(jnp.int32)
        idx = (y0 + 1) * (w + 2) + (x0 + 1)
        w00 = (1 - wx) * (1 - wy) * x0v * y0v
        w01 = wx * (1 - wy) * x1v * y0v
        w10 = (1 - wx) * wy * x0v * y1v
        w11 = wx * wy * x1v * y1v

    taps = jnp.take_along_axis(quad.data, idx[..., None], axis=1)  # [B, P, 4C]
    return (
        taps[..., 0 * c : 1 * c] * w00
        + taps[..., 1 * c : 2 * c] * w01
        + taps[..., 2 * c : 3 * c] * w10
        + taps[..., 3 * c : 4 * c] * w11
    )
