"""Fused eval-grid aggregation v2: lane-packed adaptive spatial aggregation.

Replaces the XLA eval-grid tail of PatchMatch evaluation (reference:
models/patchmatch.py:569-575 cost sampling, 627-669 depth weight, 655-661
aggregation): sample a per-pixel [x_norm | cost] image at Ke learned
neighbor positions, weight by depth-similarity x feature weight, reduce
over neighbors. The unfused XLA path materializes [B, Ke, H, W, D] volumes
and (at stage 1) serial while-loop layout conversions — ~30 ms/forward of
gather+glue at the DTU eval config (profiled, PROGRESS.md round 3).

Design (two measured failure modes of the round-2 attempt fixed):

1. u16 payload. x_norm in [0, 1] travels as 16-bit fixed point (error
   2^-17 — same as the unfused path's bf16 hi/lo pair) and the cost as
   bf16 BITS: a [x_u16 | cost_u16] table of 2D u16 channels, quad-expanded
   (ops/quad_sample.py) so ONE gather index fetches the 2x2 bilinear
   neighborhood. vs the unfused path's 3D bf16 channels this is 2/3 the
   gather traffic and holds the DTU stage-1 payload at 128 B — under the
   large-table gather payload cliff (PROGRESS.md chip table).
2. Full-lane compute. The round-2 kernel computed on [T, D] tiles — D=8
   padded 16x to the 128-lane vreg, wasting ~90% of the VPU. Here
   G = 128/(2D) neighbors are PACKED side by side into full 128-lane
   vectors with static roll/select plumbing (every D seen at evaluation is
   a power of two: 8/16/32/64, so the packing is exact). Per-sample
   scalars (fractional offsets, feature weights) arrive CHANNEL-FIRST
   [C, T] — compact in HBM where a [T, small-C] array would pad its minor
   dim 16-32x — and are transposed in-kernel by ONE f32 identity matmul on
   the otherwise-idle MXU (exact: multiplication by 1.0). The score leaves
   channel-first [B, D, HW] the same way.

score = sum_k w_k c_k / sum_k w_k equals the reference's
normalize-then-sum algebraically; floating-point association differs by
O(ulp). Inference-only (no gradients; the training path keeps the
differentiable unfused gather).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from patchmatchnet_tpu.ops.quad_sample import _gather_rows, make_quad_image

X_SCALE = 65535.0


def _pack_joint_u16(x_norm_img: jnp.ndarray, cost_img: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, D] x_norm (in [0,1]) + cost -> [B, H, W, 2D] uint16."""
    xq = jnp.round(jnp.clip(x_norm_img, 0.0, 1.0) * X_SCALE).astype(jnp.uint16)
    cu = jax.lax.bitcast_convert_type(cost_img.astype(jnp.bfloat16), jnp.uint16)
    return jnp.concatenate([xq, cu], axis=-1)


def _grid_pixel_coords(grid, height: int, width: int):
    """Normalized grid (align_corners=False) -> border-clamped pixel coords
    ix, iy [B, Ke, H*W] f32. `grid` is a (gx, gy) tuple of [B, Ke, H, W]
    arrays or a stacked [B, Ke, H, W, 2] array (see grid_sample_2d)."""
    if isinstance(grid, (tuple, list)):
        gx, gy = grid
        b, ke = gx.shape[:2]
        gx = gx.reshape(b, ke, -1)
        gy = gy.reshape(b, ke, -1)
    else:
        b, ke = grid.shape[:2]
        g2 = grid.reshape(b, ke, -1, 2)
        gx = g2[..., 0]
        gy = g2[..., 1]
    ix = ((gx + 1.0) * width - 1.0) * 0.5
    iy = ((gy + 1.0) * height - 1.0) * 0.5
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


def _spread_x(d: int, l: int) -> np.ndarray:
    """[d, L] one-hot: xc -> x-slot of every [x(d) | c(d)] lane group."""
    m = np.zeros((d, l), np.float32)
    for k in range(l // (2 * d)):
        m[np.arange(d), 2 * d * k + np.arange(d)] = 1.0
    return m


def _spread_fw(g: int, d: int, l: int) -> np.ndarray:
    """[g, L] one-hot: per-neighbor fw -> ALL lanes of its group."""
    m = np.zeros((g, l), np.float32)
    for k in range(g):
        m[k, 2 * d * k : 2 * d * (k + 1)] = 1.0
    return m


def _roll(x, shift):
    """Cyclic lane roll moving lane i to lane i+shift (shift may be <0;
    pltpu.roll itself requires a non-negative shift)."""
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _kernel(d: int, ke: int, g: int, inv_interval: float,
            taps_ref, fxyw_ref, xc_ref, it_ref, ex_ref, ef_ref, out_ref):
    t = taps_ref.shape[2]
    l = g * 2 * d  # packed lane width (<= 128)
    t8d = taps_ref.shape[-1]  # 8d
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)
    iota_8d = jax.lax.broadcasted_iota(jnp.int32, (1, t8d), 1)
    tap_group = iota_8d // (2 * d)          # which of the 4 bilinear taps
    tap_x_slot = (iota_8d // d) % 2 == 0    # x channels within each tap
    x_slot = (iota_l // d) % 2 == 0         # x channels within each ke-group

    ident = it_ref[:]                       # [T, T] f32 identity
    # per-sample scalars: channel-first [3Ke, T] -> [T, 3Ke] on the MXU
    # (layout: [fx_0, fy_0, fx_1, fy_1, ..., fw_0, ..., fw_{ke-1}])
    x_cols = jax.lax.dot_general(
        ident, fxyw_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [T, 3Ke]
    xcp = jax.lax.dot_general(
        xc_ref[0], ex_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [d, T] x [d, L] -> [T, L]: xc in every group's x slots, 0 elsewhere

    num = jnp.zeros((t, l), jnp.float32)
    den = jnp.zeros((t, l), jnp.float32)
    nq = -(-ke // g)
    for q in range(nq):
        gq = min(g, ke - q * g)
        pack = None
        for j in range(gq):
            k = q * g + j
            tap = taps_ref[0, k]            # [T, 8d] u16
            xdec = tap.astype(jnp.int32).astype(jnp.float32) * (1.0 / X_SCALE)
            cdec = jax.lax.bitcast_convert_type(tap, jnp.bfloat16).astype(
                jnp.float32
            )
            dec = jnp.where(tap_x_slot, xdec, cdec)  # [T, 8d]
            fx = x_cols[:, 2 * k : 2 * k + 1]        # [T, 1]
            fy = x_cols[:, 2 * k + 1 : 2 * k + 2]
            w00 = (1.0 - fx) * (1.0 - fy)
            w01 = fx * (1.0 - fy)
            w10 = (1.0 - fx) * fy
            w11 = fx * fy
            wsel = jnp.where(
                tap_group == 0, w00,
                jnp.where(tap_group == 1, w01,
                          jnp.where(tap_group == 2, w10, w11)),
            )  # [T, 8d]
            wd = dec * wsel
            # fold the 4 taps into lanes [0, 2d): cyclic rolls; wrapped
            # upper lanes are garbage and masked below
            comb = wd + _roll(wd, -2 * d)
            comb = comb + _roll(comb, -4 * d)
            comb = jnp.where(iota_8d < 2 * d, comb, 0.0)
            # resize [T, 8d] -> [T, L] (valid lanes [0, 2d) fit both ways)
            if l > t8d:
                comb = jnp.concatenate(
                    [comb, jnp.zeros((t, l - t8d), comb.dtype)], axis=1
                )
            elif l < t8d:
                comb = comb[:, :l]
            pack = comb if j == 0 else pack + _roll(comb, 2 * d * j)
        diff = jnp.abs(pack - xcp) * inv_interval   # valid at x slots
        dw = jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(diff, 0.0, 4.0))
        fw_sl = x_cols[:, 2 * ke + q * g : 2 * ke + q * g + gq]  # [T, gq]
        fwp = jax.lax.dot_general(
            fw_sl, ef_ref[0:gq], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [T, L]: fw over every lane of its group
        wk = jnp.where(x_slot, dw * fwp, 0.0)       # weights at x slots only
        num = num + _roll(wk, d) * pack             # cost slots: w_k * c_k
        den = den + wk                              # x slots: w_k
    # reduce the g groups (spacing 2d, g a power of two)
    s = 2 * d
    while s < l:
        num = num + _roll(num, -s)
        den = den + _roll(den, -s)
        s *= 2
    score = _roll(num, -d)[:, :d] / den[:, :d]      # [T, d]
    # channel-first output via one exact MXU transpose
    out_ref[0] = jax.lax.dot_general(
        score, ident, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [d, T]


def _block_rows(d: int, ke: int) -> int:
    """Rows per grid step: taps block (ke * T * max(8d, 128-pad) u16) plus
    the [T, T] identity stay well inside VMEM."""
    budget = 2 * 1024 * 1024
    t = max(128, min(512, budget // (ke * 2 * max(8 * d, 128))))
    return 1 << (t.bit_length() - 1)


def _pallas_score(taps, fxyw, xc, ex, ef, inv_interval, d, ke, g, t):
    b, _, hwp, _ = taps.shape
    nblk = hwp // t
    ident = jnp.eye(t, dtype=jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, d, ke, g, inv_interval),
        out_shape=jax.ShapeDtypeStruct((b, d, hwp), jnp.float32),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, ke, t, 8 * d), lambda bb, blk: (bb, 0, blk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * ke, t), lambda bb, blk: (bb, 0, blk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, t), lambda bb, blk: (bb, 0, blk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, t), lambda bb, blk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ex.shape, lambda bb, blk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ef.shape, lambda bb, blk: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, t), lambda bb, blk: (bb, 0, blk),
                               memory_space=pltpu.VMEM),
    )(taps, fxyw, xc, ident, ex, ef)


def _decode_taps(taps, d):
    """[..., 8D] u16 -> (x [..., 4, D] f32, cost [..., 4, D] f32)."""
    shp = taps.shape[:-1] + (4, 2 * d)
    t4 = taps.reshape(shp)
    x = t4[..., :d].astype(jnp.int32).astype(jnp.float32) * (1.0 / X_SCALE)
    c = jax.lax.bitcast_convert_type(t4[..., d:], jnp.bfloat16).astype(jnp.float32)
    return x, c


def _jnp_score(taps, fxy, xc, fw, inv_interval, d, ke):
    """Oracle with identical numerics structure (CPU / non-TPU path).

    taps [B, Ke, HWP, 8D] u16, fxy [B, Ke, HWP, 2] f32,
    xc [B, HWP, D] f32, fw [B, Ke, HWP] f32. Returns [B, HWP, D].
    """
    fx = fxy[..., 0:1]
    fy = fxy[..., 1:2]
    w4 = jnp.stack(
        [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy], axis=-2
    )  # [B, Ke, HWP, 4, 1]
    x4, c4 = _decode_taps(taps, d)
    x_smp = jnp.sum(x4 * w4, axis=-2)   # [B, Ke, HWP, D]
    cost = jnp.sum(c4 * w4, axis=-2)
    diff = jnp.abs(x_smp - xc[:, None]) * inv_interval
    dw = jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(diff, 0.0, 4.0))
    wk = dw * fw[..., None]
    return jnp.sum(wk * cost, axis=1) / jnp.sum(wk, axis=1)


def eval_grid_score(
    x_norm_img: jnp.ndarray,
    cost_img: jnp.ndarray,
    grid,
    feature_weight: jnp.ndarray,
    interval_scale: float,
) -> jnp.ndarray:
    """Adaptive spatial aggregation score (pre-softmax).

    Args:
        x_norm_img: [B, H, W, D] normalized inverse depth (f32, in [0, 1]).
        cost_img: [B, H, W, D] SimilarityNet output.
        grid: normalized eval sampling grid (align_corners=False
            convention, border padding) — (gx, gy) tuple of [B, Ke, H, W]
            arrays or a stacked [B, Ke, H, W, 2] array.
        feature_weight: [B, Ke, H, W] f32.
    Returns:
        score [B, H, W, D] f32 = sum_k w_k c_k / sum_k w_k.
    """
    b, h, w, d = x_norm_img.shape
    assert d & (d - 1) == 0, f"D must be a power of two, got {d}"
    ke = grid[0].shape[1] if isinstance(grid, (tuple, list)) else grid.shape[1]
    hw = h * w
    g = max(1, 128 // (2 * d))

    joint = _pack_joint_u16(jax.lax.stop_gradient(x_norm_img), cost_img)
    quad = make_quad_image(joint, "border")  # rows [B, HW, 8D] u16
    ix, iy = _grid_pixel_coords(grid, h, w)  # [B, Ke, HW]
    idx, fx, fy = _border_cells(ix, iy, h, w)
    fw = feature_weight.reshape(b, ke, hw).astype(jnp.float32)

    t = _block_rows(d, ke)
    hwp = -(-hw // t) * t
    if hwp != hw:
        p3 = ((0, 0), (0, 0), (0, hwp - hw))
        idx = jnp.pad(idx, p3)
        fx = jnp.pad(fx, p3)
        fy = jnp.pad(fy, p3)
        fw = jnp.pad(fw, p3, constant_values=1.0)

    taps = _gather_rows(quad, idx.reshape(b, -1)).reshape(b, ke, hwp, 8 * d)

    inv_interval = 1.0 / interval_scale
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import on_tpu

    xc_cf = jnp.transpose(x_norm_img.reshape(b, hw, d), (0, 2, 1))  # [B, D, HW]
    if hwp != hw:
        xc_cf = jnp.pad(xc_cf, ((0, 0), (0, 0), (0, hwp - hw)))

    if os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS") or not on_tpu():
        fxy = jnp.stack([fx, fy], axis=-1)  # [B, Ke, HWP, 2]
        xc = jnp.transpose(xc_cf, (0, 2, 1))
        score = _jnp_score(taps, fxy, xc, fw, inv_interval, d, ke)
        score = jnp.transpose(score, (0, 2, 1))  # [B, D, HWP]
    else:
        # channel-first scalar bundle [fx_0, fy_0, fx_1, fy_1, ... | fw_*]
        fxy_cf = jnp.stack([fx, fy], axis=2).reshape(b, 2 * ke, hwp)
        fxyw = jnp.concatenate([fxy_cf, fw], axis=1)  # [B, 3Ke, HWP]
        ex = jnp.asarray(_spread_x(d, g * 2 * d))
        ef = jnp.asarray(_spread_fw(g, d, g * 2 * d))
        score = _pallas_score(taps, fxyw, xc_cf, ex, ef, inv_interval, d, ke, g, t)
    return jnp.transpose(score[:, :, :hw], (0, 2, 1)).reshape(b, h, w, d)
