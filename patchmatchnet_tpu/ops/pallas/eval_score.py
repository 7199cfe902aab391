"""Fused eval-grid sampling + adaptive aggregation score (inference path).

The spatial-aggregation step of PatchMatch evaluation (reference:
models/patchmatch.py:569-575 cost sampling, 627-669 depth weight, 655-661
aggregation) samples a per-pixel [x_norm | cost] image at Ke learned
neighbor positions, weights by depth similarity x feature weight, and
reduces over neighbors. Done naively on TPU this materializes a
[B, Ke, H, W, D] volume (~200 MB at the DTU eval config) plus gather
payloads with x_norm carried as a bf16 hi/lo pair (x differences are
amplified 1/interval_scale ~ 200x downstream, so plain bf16 is too coarse).

This path packs everything into ONE uint16 gather + ONE Pallas kernel:

- x_norm in [0, 1] is stored as 16-bit fixed point (error 2^-17, the same
  as the hi/lo pair) and the SimilarityNet cost as bf16 BITS — one uint16
  table of 2D channels, quad-expanded (ops/quad_sample.py) so a single
  gather index fetches the 2x2 bilinear neighborhood.
- The kernel decodes taps, combines bilinearly in f32, computes the depth
  weight sigmoid against the center x_norm, multiplies by the feature
  weight, and accumulates the neighbor reduction in VMEM scratch — only
  the final score [B, HW, D] (num/den) is written to HBM.

Unlike the windowed warp sampler, this path works for ARBITRARY neighbor
offsets (the stage-1 eval offsets reach +-26 px with per-pixel variation —
measured too wild for tile windows), because the gather stays a real XLA
gather; only the downstream aggregation is fused.

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
    pixel coords ix, iy [B, Ke*H*W] f32."""
    b = grid.shape[0]
    g2 = grid.reshape(b, -1, 2)
    ix = ((g2[..., 0] + 1.0) * width - 1.0) * 0.5
    iy = ((g2[..., 1] + 1.0) * height - 1.0) * 0.5
    return jnp.clip(ix, 0.0, width - 1), jnp.clip(iy, 0.0, height - 1)


def _border_cells(ix, iy, height, width):
    """Border-mode quad cells + tap weights (matches quad_coords border)."""
    x0 = jnp.clip(jnp.floor(ix), 0, width - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, height - 2).astype(jnp.int32)
    wx = (ix - x0).astype(jnp.float32)
    wy = (iy - y0).astype(jnp.float32)
    idx = y0 * width + x0
    w4 = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    )  # [B, P, 4]
    return idx, w4


def _kernel(d: int, ke: int, inv_interval: float,
            taps_ref, w4_ref, xc_ref, fw_ref, out_ref, num_ref, den_ref):
    k = pl.program_id(2)
    taps = taps_ref[0]  # [T, 8D] u16
    x_smp = jnp.zeros(xc_ref.shape[1:], jnp.float32)
    cost = jnp.zeros_like(x_smp)
    for j in range(4):
        xj, cj = _decode_tap(taps[:, j * 2 * d:(j + 1) * 2 * d], d)
        wj = w4_ref[0, :, j][:, None]
        x_smp = x_smp + xj * wj
        cost = cost + cj * wj
    xc = xc_ref[0]  # [T, D] f32
    diff = jnp.abs(x_smp - xc) * inv_interval
    dw = jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(diff, 0.0, 4.0))
    # select column k of the [T, Ke] feature-weight block without a dynamic
    # lane slice (Mosaic cannot prove 128-alignment for pl.ds(k, 1))
    fwb = fw_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, fwb.shape, 1)
    fwk = jnp.sum(jnp.where(lane == k, fwb, 0.0), axis=1, keepdims=True)
    w = dw * fwk
    wc = w * cost

    @pl.when(k == 0)
    def _():
        num_ref[:] = wc
        den_ref[:] = w

    @pl.when(k > 0)
    def _():
        num_ref[:] = num_ref[:] + wc
        den_ref[:] = den_ref[:] + w

    @pl.when(k == ke - 1)
    def _():
        out_ref[0] = num_ref[:] / den_ref[:]


def _pallas_score(taps, w4, xc, fw, inv_interval, d, ke, t):
    b, p, _ = taps.shape
    hw = p // ke
    nblk = hw // t
    grid = (b, nblk, ke)
    return pl.pallas_call(
        functools.partial(_kernel, d, ke, inv_interval),
        out_shape=jax.ShapeDtypeStruct((b, hw, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, 8 * d), lambda bb, blk, k: (bb, k * nblk + blk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 4), lambda bb, blk, k: (bb, k * nblk + blk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda bb, blk, k: (bb, blk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, ke), lambda bb, blk, k: (bb, blk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda bb, blk, k: (bb, blk, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t, d), jnp.float32),
            pltpu.VMEM((t, d), jnp.float32),
        ],
    )(taps, w4, xc, fw)


def _jnp_score(taps, w4, xc, fw, inv_interval, d, ke):
    """Reference combine with identical numerics structure (CPU path)."""
    b, p, _ = taps.shape
    hw = p // ke
    x_smp = jnp.zeros((b, p, d), jnp.float32)
    cost = jnp.zeros((b, p, d), jnp.float32)
    for j in range(4):
        xj, cj = _decode_tap(taps[..., j * 2 * d:(j + 1) * 2 * d], d)
        wj = w4[..., j][..., None]
        x_smp = x_smp + xj * wj
        cost = cost + cj * wj
    xc_rep = jnp.tile(xc, (1, ke, 1))
    diff = jnp.abs(x_smp - xc_rep) * inv_interval
    dw = jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(diff, 0.0, 4.0))
    w = dw * fw.reshape(b, p, 1)
    num = jnp.sum(w.reshape(b, ke, hw, d) * cost.reshape(b, ke, hw, d), axis=1)
    den = jnp.sum(w.reshape(b, ke, hw, d), axis=1)
    return num / den


def _block_rows(d: int) -> int:
    # sized to the 16 MB scoped-VMEM stack: the decode loop's per-tap
    # widen/bitcast intermediates scale with t*d
    return 1024


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
    ix, iy = _grid_pixel_coords(grid, h, w)
    idx, w4 = _border_cells(ix, iy, h, w)  # [B, Ke*HW], [B, Ke*HW, 4]

    t = _block_rows(d)
    hwp = -(-hw // t) * t
    if hwp != hw:
        padp = ((0, 0), (0, 0), (0, hwp - hw))
        idx = jnp.pad(idx.reshape(b, ke, hw), padp).reshape(b, -1)
        w4 = jnp.pad(
            w4.reshape(b, ke, hw, 4), padp + ((0, 0),)
        ).reshape(b, -1, 4)

    taps = _gather_rows(quad, idx)  # [B, Ke*HWP, 8D] u16
    xc = x_norm_img.reshape(b, hw, d)
    fw = jnp.moveaxis(feature_weight.reshape(b, ke, hw), 1, 2)  # [B, HW, Ke]
    if hwp != hw:
        xc = jnp.pad(xc, ((0, 0), (0, hwp - hw), (0, 0)))
        fw = jnp.pad(fw, ((0, 0), (0, hwp - hw), (0, 0)), constant_values=1.0)

    inv_interval = 1.0 / interval_scale
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import on_tpu

    if os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS") or not on_tpu():
        score = _jnp_score(taps, w4, xc, fw.transpose(0, 2, 1).reshape(b, -1),
                           inv_interval, d, ke)
    else:
        score = _pallas_score(taps, w4, xc, fw, inv_interval, d, ke, t)
    return score[:, :hw].reshape(b, h, w, d)
