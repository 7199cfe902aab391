"""Fused eval-grid sampling + adaptive aggregation score (inference path).

The spatial-aggregation step of PatchMatch evaluation (reference:
models/patchmatch.py:569-575 cost sampling, 627-669 depth weight, 655-661
aggregation) samples a per-pixel [x_norm | cost] image at Ke learned
neighbor positions, weights by depth similarity x feature weight, and
reduces over neighbors. The unfused XLA path materializes a
[B, Ke, H, W, D] volume plus serial while-loop layout conversions
(~12 ms/fwd of glue at the DTU stage 1 alone, see PROGRESS.md).

This path packs everything into ONE uint16 quad gather + ONE Pallas kernel:

- x_norm in [0, 1] is stored as 16-bit fixed point (error 2^-17, the same
  as the unfused path's bf16 hi/lo pair) and the SimilarityNet cost as bf16
  BITS — one uint16 table of 2D channels, quad-expanded (ops/quad_sample.py)
  so a single gather index fetches the 2x2 bilinear neighborhood. At D=8
  (DTU stage 1) the quad payload is 128 B — under the large-table gather
  payload cliff (~256 B, PROGRESS.md chip table); at D>=16 it sits on or
  over the cliff, so the fused path is gated per stage.
- One grid step covers a block of pixels with ALL Ke neighbors resident
  ([ke, T, 8D] block); the Ke reduction is an in-kernel fori_loop so the
  decode temporaries are REUSED across neighbors — an unrolled loop's
  lane-padded [T, D] temporaries (D=8 pads 16x to 128 lanes) blow the
  16 MB scoped-VMEM stack. Bilinear weights are computed in-kernel from
  fractional coordinates.

score = sum_k w_k c_k / sum_k w_k equals the reference's
normalize-then-sum algebraically; floating-point association differs by
O(ulp).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchmatchnet_tpu.ops.quad_sample import _gather_rows, make_quad_image

X_SCALE = 65535.0


def _pack_joint_u16(x_norm_img: jnp.ndarray, cost_img: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, D] x_norm (in [0,1]) + cost -> [B, H, W, 2D] uint16."""
    xq = jnp.round(jnp.clip(x_norm_img, 0.0, 1.0) * X_SCALE).astype(jnp.uint16)
    cu = jax.lax.bitcast_convert_type(cost_img.astype(jnp.bfloat16), jnp.uint16)
    return jnp.concatenate([xq, cu], axis=-1)


def _decode_tap(tap_u16: jnp.ndarray, d: int):
    """[..., 2D] uint16 -> (x [..., D] f32, cost [..., D] f32)."""
    # Mosaic lacks a direct u16->f32 cast; widen to i32 first (exact).
    x = tap_u16[..., :d].astype(jnp.int32).astype(jnp.float32) * (1.0 / X_SCALE)
    c = jax.lax.bitcast_convert_type(tap_u16[..., d:], jnp.bfloat16).astype(jnp.float32)
    return x, c


def _grid_pixel_coords(grid: jnp.ndarray, height: int, width: int):
    """[B, Ke, H, W, 2] normalized (align_corners=False) -> border-clamped
    pixel coords ix, iy [B, Ke, H*W] f32."""
    b, ke = grid.shape[:2]
    g2 = grid.reshape(b, ke, -1, 2)
    ix = ((g2[..., 0] + 1.0) * width - 1.0) * 0.5
    iy = ((g2[..., 1] + 1.0) * height - 1.0) * 0.5
    return jnp.clip(ix, 0.0, width - 1), jnp.clip(iy, 0.0, height - 1)


def _border_cells(ix, iy, height, width):
    """Border-mode quad cells + fractional offsets (matches quad_coords
    border semantics)."""
    x0 = jnp.clip(jnp.floor(ix), 0, width - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, height - 2).astype(jnp.int32)
    fx = (ix - x0).astype(jnp.float32)
    fy = (iy - y0).astype(jnp.float32)
    idx = y0 * width + x0
    return idx, fx, fy


def _combine(tap, fx, fy, d):
    """One neighbor's bilinear x/cost combine: tap [T, 8D] u16,
    fx/fy [T, 1] f32 -> (x_smp, cost) [T, D] f32."""
    w = (
        (1.0 - fx) * (1.0 - fy),
        fx * (1.0 - fy),
        (1.0 - fx) * fy,
        fx * fy,
    )
    x_smp = None
    cost = None
    for j in range(4):
        xj, cj = _decode_tap(tap[..., j * 2 * d:(j + 1) * 2 * d], d)
        x_smp = xj * w[j] if x_smp is None else x_smp + xj * w[j]
        cost = cj * w[j] if cost is None else cost + cj * w[j]
    return x_smp, cost


def _kernel(d: int, ke: int, inv_interval: float,
            taps_ref, fxy_ref, xc_ref, fw_ref, out_ref):
    xc = xc_ref[0]  # [T, D] f32

    def body(k, carry):
        num, den = carry
        tap = taps_ref[0, k]      # [T, 8D] u16 (dynamic index on untiled dim)
        fxy = fxy_ref[0, k]       # [T, 2] f32
        fx = fxy[:, 0:1]
        fy = fxy[:, 1:2]
        x_smp, cost = _combine(tap, fx, fy, d)
        diff = jnp.abs(x_smp - xc) * inv_interval
        dw = jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(diff, 0.0, 4.0))
        wk = dw * fw_ref[0, k]    # [T, 1] broadcast over D
        return num + wk * cost, den + wk

    zero = jnp.zeros(xc.shape, jnp.float32)
    num, den = jax.lax.fori_loop(0, ke, body, (zero, zero))
    out_ref[0] = num / den


def _block_rows(d: int, ke: int) -> int:
    # taps block = ke * T * 8d u16. The binding constraint is the scoped
    # VMEM stack: the loop body's lane-padded [T, D] temporaries cost
    # T*128*4 bytes each regardless of D (measured 24.5 MB at T=1024, D=8).
    target = 1024 * 1024
    t = max(256, min(2048, target // (ke * 8 * d * 2)))
    return 1 << (t.bit_length() - 1)  # floor to a power of two


def _pallas_score(taps, fxy, xc, fw, inv_interval, d, ke, t):
    b, _, hwp, _ = taps.shape
    nblk = hwp // t
    return pl.pallas_call(
        functools.partial(_kernel, d, ke, inv_interval),
        out_shape=jax.ShapeDtypeStruct((b, hwp, d), jnp.float32),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, ke, t, 8 * d), lambda bb, blk: (bb, 0, blk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ke, t, 2), lambda bb, blk: (bb, 0, blk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda bb, blk: (bb, blk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ke, t, 1), lambda bb, blk: (bb, 0, blk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda bb, blk: (bb, blk, 0),
                               memory_space=pltpu.VMEM),
    )(taps, fxy, xc, fw)


def _jnp_score(taps, fxy, xc, fw, inv_interval, d, ke):
    """Reference combine with identical numerics structure (CPU path).

    taps [B, Ke, HWP, 8D] u16, fxy [B, Ke, HWP, 2] f32, xc [B, HWP, D] f32,
    fw [B, Ke, HWP, 1] f32.
    """
    fx = fxy[..., 0:1]
    fy = fxy[..., 1:2]
    x_smp, cost = _combine(taps, fx, fy, d)
    diff = jnp.abs(x_smp - xc[:, None]) * inv_interval
    dw = jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(diff, 0.0, 4.0))
    wk = dw * fw
    return jnp.sum(wk * cost, axis=1) / jnp.sum(wk, axis=1)


def eval_grid_score(
    x_norm_img: jnp.ndarray,
    cost_img: jnp.ndarray,
    grid: jnp.ndarray,
    feature_weight: jnp.ndarray,
    interval_scale: float,
) -> jnp.ndarray:
    """Adaptive spatial aggregation score (pre-softmax).

    Args:
        x_norm_img: [B, H, W, D] normalized inverse depth (f32, in [0, 1]).
        cost_img: [B, H, W, D] SimilarityNet output (f32).
        grid: [B, Ke, H, W, 2] normalized eval sampling grid
            (align_corners=False convention, border padding).
        feature_weight: [B, Ke, H, W] f32.
    Returns:
        score [B, H, W, D] f32 = sum_k w_k c_k / sum_k w_k.
    """
    b, h, w, d = x_norm_img.shape
    ke = grid.shape[1]
    hw = h * w

    joint = _pack_joint_u16(jax.lax.stop_gradient(x_norm_img), cost_img)
    quad = make_quad_image(joint, "border")  # [B, HW, 8D] u16
    ix, iy = _grid_pixel_coords(grid, h, w)  # [B, Ke, HW]
    idx, fx, fy = _border_cells(ix, iy, h, w)

    fxy = jnp.stack([fx, fy], axis=-1)        # [B, Ke, HW, 2]
    fw = feature_weight.reshape(b, ke, hw, 1)
    xc = x_norm_img.reshape(b, hw, d)

    t = _block_rows(d, ke)
    hwp = -(-hw // t) * t
    if hwp != hw:
        p3 = ((0, 0), (0, 0), (0, hwp - hw))
        idx = jnp.pad(idx, p3)
        fxy = jnp.pad(fxy, p3 + ((0, 0),))
        fw = jnp.pad(fw, p3 + ((0, 0),), constant_values=1.0)
        xc = jnp.pad(xc, ((0, 0), (0, hwp - hw), (0, 0)))

    taps = _gather_rows(quad, idx.reshape(b, -1)).reshape(b, ke, hwp, 8 * d)

    inv_interval = 1.0 / interval_scale
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import on_tpu

    if os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS") or not on_tpu():
        score = _jnp_score(taps, fxy, xc, fw, inv_interval, d, ke)
    else:
        score = _pallas_score(taps, fxy, xc, fw, inv_interval, d, ke, t)
    return score[:, :hw].reshape(b, h, w, d)
