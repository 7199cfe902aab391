"""Bilinear grid sampling (NHWC), matching torch.nn.functional.grid_sample.

Two conventions are used by the PatchMatch pipeline and both are reproduced
exactly (reference: models/module.py:175-181 uses align_corners=True +
padding_mode="zeros" for homography warping; models/patchmatch.py:117-123,
569-575, 615-617, 659-661 use align_corners=False + padding_mode="border" for
the learned-offset neighbor sampling):

- ``align_corners=True``:  ix = (x + 1) / 2 * (W - 1)
- ``align_corners=False``: ix = ((x + 1) * W - 1) / 2
- ``zeros``:  out-of-bounds taps contribute 0
- ``border``: coordinates are clamped to the valid range before interpolation

Two implementations with identical results:
- "quad" (default): one gather index per point fetching the whole 2x2
  neighborhood from a precomputed quad image — ~4x fewer gather indices,
  the TPU gather bottleneck (see ops/quad_sample.py).
- "taps4": the classic 4-gather formulation (kept for testing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from patchmatchnet_tpu.ops.quad_sample import make_quad_image, quad_sample


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


@functools.partial(
    jax.jit, static_argnames=("align_corners", "padding_mode", "method")
)
def grid_sample_2d(
    image: jnp.ndarray,
    grid,
    *,
    align_corners: bool,
    padding_mode: str,
    method: str = "quad",
) -> jnp.ndarray:
    """Sample `image` bilinearly at normalized grid locations.

    Args:
        image: [B, H, W, C] features.
        grid: normalized (x, y) coordinates in [-1, 1] — either a stacked
            [B, ..., 2] array (torch grid layout) or a (gx, gy) tuple of
            [B, ...] arrays. Prefer the tuple on TPU: a trailing 2-dim
            forces a T(2,128)-tiled layout and XLA lowers the stack/unstack
            around it to serial while-loops (measured ~3 ms/forward at the
            DTU eval config).
        align_corners: torch semantics flag (see module docstring).
        padding_mode: "zeros" or "border".
        method: "quad" (default) or "taps4".

    Returns:
        [B, ..., C] sampled features.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    batch, height, width, channels = image.shape
    if isinstance(grid, (tuple, list)):
        gx, gy = grid
        out_shape = gx.shape + (channels,)
        gx = gx.reshape(batch, -1)
        gy = gy.reshape(batch, -1)
    else:
        out_shape = grid.shape[:-1] + (channels,)
        grid2 = grid.reshape(batch, -1, 2)
        gx = grid2[..., 0]
        gy = grid2[..., 1]

    ix = _unnormalize(gx, width, align_corners)
    iy = _unnormalize(gy, height, align_corners)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, width - 1)
        iy = jnp.clip(iy, 0.0, height - 1)

    if method == "quad":
        quad = make_quad_image(image, padding_mode)
        out = quad_sample(quad, ix, iy, padding_mode=padding_mode)
        return out.reshape(out_shape)

    # --- reference 4-tap formulation ---
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0)[..., None]
    wy = (iy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = image.reshape(batch, height * width, channels)

    def tap(yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        yc = jnp.clip(yi, 0, height - 1)
        xc = jnp.clip(xi, 0, width - 1)
        idx = yc * width + xc  # [B, P]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, P, C]
        if padding_mode == "zeros":
            valid = (
                (xi >= 0) & (xi <= width - 1) & (yi >= 0) & (yi <= height - 1)
            )
            vals = vals * valid[..., None].astype(vals.dtype)
        return vals

    out = (
        tap(y0i, x0i) * (1 - wx) * (1 - wy)
        + tap(y0i, x1i) * wx * (1 - wy)
        + tap(y1i, x0i) * (1 - wx) * wy
        + tap(y1i, x1i) * wx * wy
    )
    return out.reshape(out_shape)
