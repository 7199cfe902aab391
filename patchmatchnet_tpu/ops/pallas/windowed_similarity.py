"""Windowed warp-sampling + group-similarity kernel (gather-free hot path).

The PatchmatchNet evaluation step is sampling-bound: for every (pixel, depth
hypothesis, source view) it bilinearly samples source features and correlates
them with the reference feature (reference: models/module.py:130-181 warping +
models/patchmatch.py:198-217 group correlation). The round-1 path realized
this as an XLA gather of 2x2 "quad" taps plus a fused Pallas combine kernel —
correct, but the [P, 4C] taps intermediate makes a full HBM round trip
(~6 GB/forward at the DTU eval config), and TPU gathers cost ~2-4 ns/index on
top. Both costs are eliminated here by exploiting sample locality measured on
real warps (tools/dev/window_stats.py): all samples of an 8-row x TW-col
pixel tile land in a ~12-row x ~(TW+8)-col source window, even for the
stage-3 stratified random initialization (a depth stratum projects to a
narrow band).

Kernel structure, per (batch, tile) grid step:

  window = quad_table[oy : oy+HWIN, ox : ox+WWIN]     (Element-indexed DMA,
                                                       origins scalar-prefetched)
  for each of the TH ref rows:
      band  = window[r0 : r0+HBAND]                   (dynamic sublane slice)
      h     = exact one-hot[(band row, window col), (d, pixel)]
      taps  = band^T @ h          # [4C, S] — the "gather" as one MXU matmul
      warped= sum_t w4_t * taps[tC:(t+1)C]            (f32 bilinear, in VMEM)
      sim   = gm^T @ (warped * ref_row)               # [G, S] group means

The one-hot is exact (0/1 in bf16), so taps are bit-identical to a gather of
the bf16 table; bilinear weights and all accumulation stay f32 — the same
numerics contract as the round-1 kernel (see PROGRESS.md precision table).

Coverage: samples whose quad cell falls outside the tile window or row band
contribute exactly zero (the one-hot matches no column) — the same value an
off-image sample produces. Window sizes are chosen so this cannot happen for
smooth warp fields; `escape_count` measures it exactly and tests assert 0 on
real scenes. The pure-jnp reference (`_jnp_windowed`) reproduces the window
semantics bit-for-bit and runs everywhere (CPU tests); the Pallas path
requires a TPU backend and bf16 tables.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas import core as pallas_core  # Element block dims

HWIN_MAX = 48   # table row padding covers any th <= 32 (hwin = th + 16)
TH_DEFAULT = 8  # ref rows per tile; higher cuts grid steps, grows windows
HBAND_DEFAULT = 7   # band rows per (ref row, all d); env-overridable
                    # ENVELOPE for callers that bypass the derivation.
                    # The band a geometry actually needs is DERIVED, not
                    # guessed: iy(d) = (ry*d + m7)/(rz*d + m11) is a Mobius
                    # function of depth, so each pixel's source-row interval
                    # over the whole clamped hypothesis range [dmin, dmax]
                    # is attained at the range endpoints (pole crossings
                    # exit through a computable image edge); the band
                    # requirement is that interval's span UNIONED ACROSS A
                    # TILE — i.e. the epipolar tilt across tw columns and
                    # th rows — plus the 1-row r0 bias and 1 host-vs-device
                    # f32 rounding slack row. ops/pallas/window_bounds.py
                    # computes exactly this per scene (the production
                    # DepthEstimator derives per shape; this constant = the
                    # derivation's answer at the DTU bench geometry at
                    # tw=48: span 5 + covered row + ULP slack).
TW_DEFAULT = 48     # preferred tile width; narrower tiles keep the epipolar
                    # tilt across a ref-row slab within the band (derived:
                    # band 7 at tw=48 vs None/overflow at tw=112 on the
                    # ETH3D portrait class; chosen jointly with hband by
                    # window_bounds.derive_stage_windows)
X_MARGIN = 16   # window cols beyond TW: bbox margin + 16-col origin quantization
SC_MAX = 2304   # max lanes per in-kernel d-chunk (bounds the one-hot VMEM)


class WindowConfig(NamedTuple):
    th: int      # ref rows per tile (divides padded H; 8, 4, 2, or 1)
    tw: int      # tile width (divides padded W, multiple of 16)
    ty: int      # tiles in y  (HP // th)
    tx: int      # tiles in x  (WP // tw)
    wwin: int    # window cols (multiple of 16)
    hband: int   # band rows per ref row
    hp: int      # padded height (edge-padded coords; output sliced back)
    wp: int      # padded width
    hwin: int    # window rows: tile y-extent + 8-row origin quantization + margin


def choose_tile_width(width: int) -> int | None:
    """Tile width (multiple of 16, >= configured minimum): prefer an exact
    divisor of `width` (no padded compute); otherwise the width minimizing
    padded-out columns. The one-hot matmul costs hband * (tw + margin) * 4C
    MACs per sample, so narrower tiles are cheaper AND need a shorter band
    (epipolar tilt across the slab scales with tw). S = D * tw stays a
    multiple of 128 for every even D >= 8. None only for degenerate widths."""
    tw_min = int(os.environ.get("PATCHMATCHNET_TPU_TW", TW_DEFAULT))
    if width < 16:
        return None
    for tw in range(tw_min, 257, 16):
        if width % tw == 0:
            return tw
    # No exact divisor: pad the width out to the NARROWEST tile instead of
    # widening tiles — the band height requirement (epipolar tilt across a
    # ref-row slab) grows with tile width, so wider tiles would need taller
    # bands to stay escape-free while padding only costs extra columns.
    return tw_min


def make_config(
    height: int,
    width: int,
    hband: int | None = None,
    tw: int | None = None,
) -> WindowConfig | None:
    """Window geometry for a stage shape. `hband`/`tw` override the band
    height / tile width (derived per scene by
    ops/pallas/window_bounds.derive_stage_windows — the band requirement is
    a function of the epipolar tilt ACROSS the tile, so they are chosen
    jointly; the env var / HBAND_DEFAULT envelope applies when None)."""
    if tw is None:
        tw = choose_tile_width(width)
    elif tw % 16 != 0 or tw < 16:
        raise ValueError(f"tile width must be a positive multiple of 16: {tw}")
    if tw is None or height < 8:
        return None
    th = int(os.environ.get("PATCHMATCHNET_TPU_TH", TH_DEFAULT))
    if not 1 <= th <= HWIN_MAX - 16:
        # hwin = th + 16 must stay within the HWIN_MAX row padding of
        # make_quad_table_2d, or the Element-indexed window block reads past
        # the table on short images
        raise ValueError(
            f"PATCHMATCHNET_TPU_TH={th} out of range [1, {HWIN_MAX - 16}]"
        )
    hp = -(-height // th) * th
    wp = -(-width // tw) * tw
    # window cols: tile extent + bbox margin + 16-col origin quantization,
    # clamped to the (16-aligned) table width when the table is narrower
    wwin = min(tw + X_MARGIN * 2, -(-(width + 1) // 16) * 16)
    if hband is None:
        hband = int(os.environ.get("PATCHMATCHNET_TPU_HBAND", HBAND_DEFAULT))
    hwin = th + 16
    if not 1 <= hband <= hwin:
        # hband > hwin would make the r0 clip bound negative (out-of-bounds
        # band slices); larger bands need a taller window (raise TH too)
        raise ValueError(
            f"PATCHMATCHNET_TPU_HBAND={hband} out of range [1, {hwin}] "
            f"(hwin = th + 16 with th={th})"
        )
    return WindowConfig(th, tw, hp // th, wp // tw, wwin, hband, hp, wp, hwin)


def _d_chunk(d: int, tw: int) -> int:
    """Largest divisor of d with dc * tw <= SC_MAX lanes and dc * tw a
    multiple of 128 (static lane-slice boundaries). Falls back to d."""
    for dc in range(min(d, max(1, SC_MAX // tw)), 0, -1):
        if d % dc == 0 and (dc * tw) % 128 == 0:
            return dc
    return d


def _col_pack(c4: int) -> int:
    """Column-pack factor for the window operand: a [.., Wt, C4] table
    with C4=64 (stage-1 C=16) tiles its minor dim 64 -> 128 lanes, i.e.
    2x physical inflation on every windowed byte. Packing column PAIRS
    ([.., Wt/2, 128]) makes the minor dim exactly one lane tile — memory
    order (row, col, c) is unchanged, so band.reshape(K, C4) and the
    one-hot index are untouched. C4 >= 128 is already lane-dense."""
    return 2 if c4 < 128 else 1


def _load_band(win_ref, r0, hband: int, wwin: int, c4: int, prefix=()):
    """Load the [K, C4] band matrix from a column-packed window ref
    [..., hwin, wwin/pf, pf*c4].

    pf=1: natural (band_row, col) row order. pf=2: Mosaic cannot shape-cast
    lanes 128 -> 64, so the two packed columns are LANE-SLICED apart (a
    supported static slice) and stacked as two row blocks — row order
    (col parity, band_row, col/2), matched by `_band_index`."""
    pf = _col_pack(c4)
    band = win_ref[prefix + (pl.ds(r0, hband),)]  # [hband, wwin/pf, pf*c4]
    if pf == 1:
        return band.reshape(hband * wwin, c4)
    half = hband * (wwin // 2)
    even = band[:, :, :c4].reshape(half, c4)
    odd = band[:, :, c4:].reshape(half, c4)
    # Mosaic cannot shape-cast or concatenate across the lane split; the
    # halves stay separate and `_band_matmul` contracts each against the
    # matching one-hot row block.
    return even, odd


def _band_matmul(band, h):
    """taps [C4, S] = band^T @ one-hot, handling the pf=2 two-block form."""
    if isinstance(band, tuple):
        even, odd = band
        half = even.shape[0]
        t0 = jax.lax.dot_general(
            even, h[:half], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t1 = jax.lax.dot_general(
            odd, h[half:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return t0 + t1
    return jax.lax.dot_general(
        band, h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _band_index(qx, ry, hband: int, wwin: int, c4: int):
    """Linearized one-hot index matching `_load_band`'s row order; -1 for
    out-of-window samples. Both branches guard ry with an unsigned compare:
    on pf=1 an above-band ry would give li >= K, which the forward one-hot
    matches nothing against (correct, zero) but which a `li >= 0` backward
    cotangent mask would MISS — escapes must map to exactly -1 so forward
    and backward agree on "contributed nothing". On pf=2 the parity fold
    can additionally alias the other parity block when ry leaves
    [0, hband)."""
    pf = _col_pack(c4)
    if pf == 1:
        li = ry * wwin + qx
        ok = (qx >= 0) & (qx < wwin) & (ry.astype(jnp.uint32) < hband)
        return jnp.where(ok, li, -1)
    half = hband * (wwin // 2)
    li = (qx & 1) * half + ry * (wwin // 2) + (qx >> 1)
    ok = (qx >= 0) & (qx < wwin) & (ry.astype(jnp.uint32) < hband)
    return jnp.where(ok, li, -1)


def make_quad_table_2d(image: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] features -> zeros-padded 2-D quad table
    [B, H+pad, W+pad, 4C] with Q[y, x] = (I[y-1,x-1], I[y-1,x], I[y,x-1],
    I[y,x]) on the zero-ring image, i.e. Q[y, x] = 2x2 neighborhood at
    (y-1, x-1): row y of the table corresponds to quad row index
    (y0 + 1) as used by ops.quad_sample.quad_coords (zeros mode).

    Rows/cols are padded so any (8/16)-quantized window origin plus
    (HWIN, WWIN) stays in bounds.
    """
    b, h, w, c = image.shape
    img = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [
            img[:, : h + 1, : w + 1],
            img[:, : h + 1, 1:],
            img[:, 1:, : w + 1],
            img[:, 1:, 1:],
        ],
        axis=-1,
    )  # [B, H+1, W+1, 4C]
    hq, wq = h + 1, w + 1
    hq_pad = max(-(-hq // 8) * 8, HWIN_MAX)
    wq_pad = -(-wq // 16) * 16
    return jnp.pad(quad, ((0, 0), (0, hq_pad - hq), (0, wq_pad - wq), (0, 0)))


def _tile_coords(a: jnp.ndarray, cfg: WindowConfig):
    """[B, D, H, W] -> [B, TY, TX, th, D*TW] with lanes ordered (d, px)."""
    b, d, h, w = a.shape
    a = a.reshape(b, d, cfg.ty, cfg.th, cfg.tx, cfg.tw)
    return jnp.transpose(a, (0, 2, 4, 3, 1, 5)).reshape(
        b, cfg.ty, cfg.tx, cfg.th, d * cfg.tw
    )


def _quad_cells(ix, iy, height, width):
    """Quad-table cell coords + validity, matching quad_coords zeros mode."""
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    qx = jnp.clip(x0f, -1, width - 1).astype(jnp.int32) + 1
    qy = jnp.clip(y0f, -1, height - 1).astype(jnp.int32) + 1
    valid = (x0f >= -1) & (x0f <= width - 1) & (y0f >= -1) & (y0f <= height - 1)
    return qx, qy, valid


def _origins(ix, iy, cfg: WindowConfig, height, width, table_h, table_w):
    """Per-tile window origins + per-(tile, ref row) band starts.

    Returns (oy [B*TY*TX], ox [B*TY*TX], r0 [B*TY*TX*TH]) int32, with oy
    quantized to 8 rows, ox to 16 cols, r0 relative to oy in [0, HWIN-HBAND].
    """
    b, d, h, w = ix.shape
    qx, qy, valid = _quad_cells(ix, iy, height, width)
    big = jnp.int32(1 << 20)
    # min over d first (contiguous), then tiled spatial mins as reduce_window
    # (a reshaped strided reduce lowers to slow dynamic-slice loops)
    qx_d = jnp.min(jnp.where(valid, qx, big), axis=1)  # [B, H, W]
    qy_d = jnp.min(jnp.where(valid, qy, big), axis=1)

    def _tile_min(a, wy, wx):
        return jax.lax.reduce_window(
            a, big, jax.lax.min,
            window_dimensions=(1, wy, wx),
            window_strides=(1, wy, wx),
            padding="VALID",
        )

    oy = _tile_min(qy_d, cfg.th, cfg.tw)  # [B, TY, TX]
    ox = _tile_min(qx_d, cfg.th, cfg.tw)
    oy = jnp.clip(oy, 0, max(table_h - cfg.hwin, 0)) & ~7
    ox = jnp.clip(ox, 0, max(table_w - cfg.wwin, 0)) & ~15
    r0 = _tile_min(qy_d, 1, cfg.tw)  # [B, H, TX]
    # Bias one row BELOW the row minimum: the min edge is always tight (r0
    # IS the min), so a 1-ULP disagreement between this XLA mirror and the
    # in-kernel coordinate association (_kernel_proj: Mosaic may contract
    # FMAs differently) could otherwise flip floor(iy) down at an integer
    # boundary and zero the sample (ry = -1). One slack row absorbs any
    # ULP-level flip; HBAND_DEFAULT accounts for it.
    r0 = r0.reshape(b, cfg.ty, cfg.th, cfg.tx) - oy[:, :, None, :] - 1
    r0 = jnp.clip(r0, 0, cfg.hwin - cfg.hband)
    r0 = jnp.transpose(r0, (0, 1, 3, 2))  # [B, TY, TX, th]
    return oy.reshape(-1), ox.reshape(-1), r0.reshape(-1)


def _pad_spatial(ix, iy, ref_feature, cfg: WindowConfig):
    """Edge-pad coords (so window origins see valid positions) and zero-pad
    ref features to the tiled (hp, wp) geometry."""
    b, d, h, w = ix.shape
    if (cfg.hp, cfg.wp) == (h, w):
        return ix, iy, ref_feature
    pad = ((0, 0), (0, 0), (0, cfg.hp - h), (0, cfg.wp - w))
    ix = jnp.pad(ix, pad, mode="edge")
    iy = jnp.pad(iy, pad, mode="edge")
    if ref_feature is not None:
        ref_feature = jnp.pad(
            ref_feature,
            ((0, 0), (0, cfg.hp - h), (0, cfg.wp - w), (0, 0)),
        )
    return ix, iy, ref_feature


def escape_count(ix, iy, cfg: WindowConfig, height, width, table_h, table_w):
    """Number of valid samples the windowed kernel would zero out (coverage
    diagnostic; 0 means the windowed path is exactly the gather path).
    `height`/`width` are the TRUE image dims; coords may be unpadded."""
    ix, iy, _ = _pad_spatial(ix, iy, None, cfg)
    b, d, h, w = ix.shape
    qx, qy, valid = _quad_cells(ix, iy, height, width)
    oy, ox, r0 = _origins(ix, iy, cfg, height, width, table_h, table_w)
    oy = oy.reshape(b, cfg.ty, 1, cfg.tx, 1)
    ox = ox.reshape(b, cfg.ty, 1, cfg.tx, 1)
    r0 = r0.reshape(b, cfg.ty, cfg.tx, cfg.th)
    r0 = jnp.transpose(r0, (0, 1, 3, 2))[:, :, :, :, None]  # [B, TY, th, TX, 1]
    qx = qx.reshape(b, d, cfg.ty, cfg.th, cfg.tx, cfg.tw)
    qy = qy.reshape(b, d, cfg.ty, cfg.th, cfg.tx, cfg.tw)
    valid = valid.reshape(b, d, cfg.ty, cfg.th, cfg.tx, cfg.tw)
    ry = qy - (oy + r0)[:, None]
    rx = qx - ox[:, None]
    inside = (ry >= 0) & (ry < cfg.hband) & (rx >= 0) & (rx < cfg.wwin)
    return jnp.sum(valid & ~inside)


def _bilinear_weights(ix, iy, height, width):
    """Zeros-mode bilinear tap weights (f32), matching quad_coords."""
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    fx = (ix - x0f).astype(jnp.float32)
    fy = (iy - y0f).astype(jnp.float32)
    x0v = ((x0f >= 0) & (x0f <= width - 1)).astype(jnp.float32)
    x1v = ((x0f >= -1) & (x0f <= width - 2)).astype(jnp.float32)
    y0v = ((y0f >= 0) & (y0f <= height - 1)).astype(jnp.float32)
    y1v = ((y0f >= -1) & (y0f <= height - 2)).astype(jnp.float32)
    w00 = (1 - fx) * (1 - fy) * x0v * y0v
    w01 = fx * (1 - fy) * x1v * y0v
    w10 = (1 - fx) * fy * x0v * y1v
    w11 = fx * fy * x1v * y1v
    return w00, w01, w10, w11


def _kernel(cfg, c: int, g: int,
            oy_ref, ox_ref, r0_ref, cxy_ref, ref_ref, win_ref, gm_ref, out_ref):
    c4 = 4 * c
    k = cfg.hband * cfg.wwin
    t = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) * pl.num_programs(2) + pl.program_id(2)
    oy = oy_ref[t]
    ox = ox_ref[t]
    j_lin = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    gm = gm_ref[:]  # [C, G] f32

    d = cxy_ref.shape[-1] // cfg.tw
    dc = _d_chunk(d, cfg.tw)
    sc = dc * cfg.tw
    for rr in range(cfg.th):
        r0 = r0_ref[t * cfg.th + rr]
        band_flat = _load_band(win_ref, r0, cfg.hband, cfg.wwin, c4, (0,))
        for ch in range(d // dc):
            sl = slice(ch * sc, (ch + 1) * sc)
            ix = cxy_ref[0, 0, 0, 0, rr, sl]  # [SC] f32
            iy = cxy_ref[0, 1, 0, 0, rr, sl]
            w00, w01, w10, w11 = _bilinear_weights(ix, iy, cfg.img_h, cfg.img_w)
            x0f = jnp.floor(ix)
            y0f = jnp.floor(iy)
            qx = jnp.clip(x0f, -1, cfg.img_w - 1).astype(jnp.int32) + 1 - ox
            qy = jnp.clip(y0f, -1, cfg.img_h - 1).astype(jnp.int32) + 1 - oy
            # one-hot: single compare against the linearized chunk-ordered
            # band index (out-of-window/-band samples forced to -1)
            ry = qy - r0
            li = _band_index(qx, ry, cfg.hband, cfg.wwin, c4)
            h = (j_lin == li[None, :]).astype(jnp.bfloat16)
            taps = _band_matmul(band_flat, h)  # [C4, SC]
            warped = (taps[0 * c:1 * c] * w00[None, :]
                      + taps[1 * c:2 * c] * w01[None, :]
                      + taps[2 * c:3 * c] * w10[None, :]
                      + taps[3 * c:4 * c] * w11[None, :])  # [C, SC]
            ref_rep = pltpu.repeat(ref_ref[0, 0, 0, rr].astype(jnp.float32), dc, axis=1)
            prod = warped * ref_rep
            sim = jax.lax.dot_general(
                gm, prod, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, SC]
            out_ref[0, :, 0, 0, rr, sl] = sim


def _kernel_proj(cfg, c: int, g: int,
                 oy_ref, ox_ref, r0_ref, mat_ref, dep_ref, ref_ref, win_ref,
                 gm_ref, out_ref):
    """Like `_kernel`, but computes the warp coordinates IN-KERNEL from the
    tiled depth hypotheses and the 3x4 projection scalars (SMEM): ix = px/pz
    with p = R [u, v, 1]^T * depth + t and the non-positive-depth push
    (reference: models/module.py:148-169). This removes the [B, D, H, W]
    ix/iy materialization, their tile transposes, and half the per-tile
    coordinate DMA — the glue around the kernel measured comparable to the
    kernel itself.

    The window operand arrives LANE-FLATTENED [B, Ht, Wt*4C]: a
    [B, Ht, Wt, 4C] block would tile its 4C=16..256 minor dim to 128 lanes
    (2x physical inflation at C=16), and the window overlap between
    adjacent tiles already amplifies reads ~2.6x — flattening makes every
    windowed byte a real byte."""
    c4 = 4 * c
    k = cfg.hband * cfg.wwin
    bb = pl.program_id(0)
    ty_i = pl.program_id(1)
    tx_i = pl.program_id(2)
    t = (bb * pl.num_programs(1) + ty_i) * pl.num_programs(2) + tx_i
    oy = oy_ref[t]
    ox = ox_ref[t]
    j_lin = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    gm = gm_ref[:]  # [C, G] f32

    d = dep_ref.shape[-1] // cfg.tw
    dc = _d_chunk(d, cfg.tw)
    sc = dc * cfg.tw
    # u is periodic over the (d, px) lane order; v is constant per ref row
    u = (
        jax.lax.broadcasted_iota(jnp.int32, (1, sc), 1) % cfg.tw
        + tx_i * cfg.tw
    ).astype(jnp.float32)[0]
    # mat arrives as a prefetch scalar [B*12] (an SMEM (1, 12) block would
    # violate the last-two-dims block rule at batch > 1)
    m = [mat_ref[bb * 12 + i] for i in range(12)]
    wf = jnp.float32(cfg.img_w)
    hf = jnp.float32(cfg.img_h)
    for rr in range(cfg.th):
        r0 = r0_ref[t * cfg.th + rr]
        band_flat = _load_band(win_ref, r0, cfg.hband, cfg.wwin, c4, (0,))
        for ch in range(d // dc):
            sl = slice(ch * sc, (ch + 1) * sc)
            dep = dep_ref[0, 0, 0, 0, rr, sl]  # [SC] f32
            vv = jnp.float32(ty_i * cfg.th + rr)
            rx = m[0] * u + (m[1] * vv + m[2])
            ry = m[4] * u + (m[5] * vv + m[6])
            rz = m[8] * u + (m[9] * vv + m[10])
            px = rx * dep + m[3]
            py = ry * dep + m[7]
            pz = rz * dep + m[11]
            neg = pz <= 1e-3
            ix = jnp.where(neg, wf, px / pz)
            iy = jnp.where(neg, hf, py / pz)
            w00, w01, w10, w11 = _bilinear_weights(ix, iy, cfg.img_h, cfg.img_w)
            x0f = jnp.floor(ix)
            y0f = jnp.floor(iy)
            qx = jnp.clip(x0f, -1, cfg.img_w - 1).astype(jnp.int32) + 1 - ox
            qy = jnp.clip(y0f, -1, cfg.img_h - 1).astype(jnp.int32) + 1 - oy
            ryy = qy - r0
            li = _band_index(qx, ryy, cfg.hband, cfg.wwin, c4)
            h = (j_lin == li[None, :]).astype(jnp.bfloat16)
            taps = _band_matmul(band_flat, h)  # [C4, SC]
            warped = (taps[0 * c:1 * c] * w00[None, :]
                      + taps[1 * c:2 * c] * w01[None, :]
                      + taps[2 * c:3 * c] * w10[None, :]
                      + taps[3 * c:4 * c] * w11[None, :])  # [C, SC]
            ref_rep = pltpu.repeat(ref_ref[0, 0, 0, rr].astype(jnp.float32), dc, axis=1)
            prod = warped * ref_rep
            sim = jax.lax.dot_general(
                gm, prod, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, SC]
            out_ref[0, :, 0, 0, rr, sl] = sim


def _pallas_windowed(quad2d, ix, iy, ref_feature, gm, cfg: WindowConfig,
                     img_h: int, img_w: int):
    b, d, h, w = ix.shape  # padded dims
    _, table_h, table_w, c4 = quad2d.shape
    c = c4 // 4
    pf = _col_pack(c4)
    g = gm.shape[1]
    s = d * cfg.tw

    oy, ox, r0 = _origins(ix, iy, cfg, img_h, img_w, table_h, table_w)
    cxy = jnp.stack([_tile_coords(ix, cfg), _tile_coords(iy, cfg)], axis=1)
    # ref features channels-on-sublane per tile: [B, TY, TX, th, C, TW]
    ref_t = ref_feature.reshape(b, cfg.ty, cfg.th, cfg.tx, cfg.tw, c)
    ref_t = jnp.transpose(ref_t, (0, 1, 3, 2, 5, 4))

    # dims the kernel needs beyond the config tuple
    class _Cfg(NamedTuple):
        th: int
        tw: int
        ty: int
        tx: int
        wwin: int
        hband: int
        hp: int
        wp: int
        hwin: int
        img_h: int
        img_w: int

    kcfg = _Cfg(*cfg, img_h, img_w)

    E = pallas_core.Element
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, cfg.ty, cfg.tx),
        in_specs=[
            pl.BlockSpec((1, 2, 1, 1, cfg.th, s),
                         lambda bb, ty, tx, *_: (bb, 0, ty, tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cfg.th, c, cfg.tw),
                         lambda bb, ty, tx, *_: (bb, ty, tx, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (E(1), E(cfg.hwin), E(cfg.wwin // pf), E(pf * c4)),
                lambda bb, ty, tx, oy_s, ox_s, r0_s: (
                    bb,
                    pl.multiple_of(oy_s[(bb * cfg.ty + ty) * cfg.tx + tx], 8),
                    pl.multiple_of(
                        ox_s[(bb * cfg.ty + ty) * cfg.tx + tx] // pf, 16 // pf
                    ),
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, g), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, 1, 1, cfg.th, s),
                               lambda bb, ty, tx, *_: (bb, 0, ty, tx, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, kcfg, c, g),
        out_shape=jax.ShapeDtypeStruct((b, g, cfg.ty, cfg.tx, cfg.th, s), jnp.float32),
        grid_spec=grid_spec,
    )(oy, ox, r0, cxy, ref_t,
      quad2d.reshape(b, table_h, table_w // pf, pf * c4), gm)
    # [B, G, TY, TX, th, (D, TW)] -> [B, G, D, H, W]
    out = out.reshape(b, g, cfg.ty, cfg.tx, cfg.th, d, cfg.tw)
    out = jnp.transpose(out, (0, 1, 5, 2, 4, 3, 6))
    return out.reshape(b, g, d, h, w)


def _jnp_windowed(quad2d, ix, iy, ref_feature, gm, cfg: WindowConfig,
                  img_h: int, img_w: int):
    """Pure-jnp emulation with identical window/band/escape semantics.

    Used on non-TPU backends and as the test oracle. Escaped samples
    contribute zero, exactly as in the kernel.
    """
    b, d, h, w = ix.shape  # padded dims
    _, table_h, table_w, c4 = quad2d.shape
    c = c4 // 4
    qx, qy, valid = _quad_cells(ix, iy, img_h, img_w)
    oy, ox, r0 = _origins(ix, iy, cfg, img_h, img_w, table_h, table_w)
    oy_f = jnp.repeat(jnp.repeat(oy.reshape(b, cfg.ty, cfg.tx), cfg.th, 1).reshape(
        b, cfg.ty * cfg.th, cfg.tx), cfg.tw, 2).reshape(b, 1, h, w)
    ox_f = jnp.repeat(jnp.repeat(ox.reshape(b, cfg.ty, cfg.tx), cfg.th, 1).reshape(
        b, cfg.ty * cfg.th, cfg.tx), cfg.tw, 2).reshape(b, 1, h, w)
    r0_f = r0.reshape(b, cfg.ty, cfg.tx, cfg.th)
    r0_f = jnp.transpose(r0_f, (0, 1, 3, 2))
    r0_f = jnp.repeat(r0_f.reshape(b, h, cfg.tx), cfg.tw, 2).reshape(b, 1, h, w)
    ry = qy - (oy_f + r0_f)
    rx = qx - ox_f
    inside = (ry >= 0) & (ry < cfg.hband) & (rx >= 0) & (rx < cfg.wwin)
    flat = quad2d.reshape(b, table_h * table_w, c4)
    lin = jnp.clip(qy, 0, table_h - 1) * table_w + jnp.clip(qx, 0, table_w - 1)
    rows = jnp.take_along_axis(
        flat, lin.reshape(b, -1)[..., None], axis=1, mode="promise_in_bounds"
    ).reshape(b, d, h, w, c4)
    w00, w01, w10, w11 = _bilinear_weights(ix, iy, img_h, img_w)
    zero = jnp.float32(0)
    m = inside[..., None]
    warped = jnp.where(
        m,
        rows[..., 0 * c:1 * c] * w00[..., None]
        + rows[..., 1 * c:2 * c] * w01[..., None]
        + rows[..., 2 * c:3 * c] * w10[..., None]
        + rows[..., 3 * c:4 * c] * w11[..., None],
        zero,
    )
    prod = warped * ref_feature[:, None].astype(jnp.float32)
    return jnp.einsum(
        "bdhwc,cg->bgdhw", prod, gm.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )








def _coords_from_depth(mat12: jnp.ndarray, depth: jnp.ndarray,
                       img_h: int, img_w: int):
    """XLA mirror of the in-kernel coordinate math: [B, 12] proj scalars +
    [B, D, H(P), W(P)] depth -> ix, iy [B, D, H(P), W(P)] f32 on the
    (possibly padded) pixel grid. Used for window-origin reductions (XLA
    fuses it into the min-reduce; the full field is never materialized)
    and by the jnp fallback path."""
    b, d, h, w = depth.shape
    m = mat12.reshape(b, 12)
    vv, uu = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    uu = uu[None, None]
    vv = vv[None, None]

    def c(i):
        return m[:, i].reshape(b, 1, 1, 1)

    rx = c(0) * uu + c(1) * vv + c(2)
    ry = c(4) * uu + c(5) * vv + c(6)
    rz = c(8) * uu + c(9) * vv + c(10)
    px = rx * depth + c(3)
    py = ry * depth + c(7)
    pz = rz * depth + c(11)
    neg = pz <= 1e-3
    ix = jnp.where(neg, jnp.float32(img_w), px / pz)
    iy = jnp.where(neg, jnp.float32(img_h), py / pz)
    return jax.lax.stop_gradient(ix), jax.lax.stop_gradient(iy)


def _pallas_windowed_proj(quad2d, mat12, depth_p, ix, iy, ref_feature, gm,
                          cfg: WindowConfig, img_h: int, img_w: int):
    """Proj variant: depth + projection scalars in, coords computed
    in-kernel; `ix`/`iy` are only consumed by the origin reductions."""
    b, d, h, w = depth_p.shape  # padded dims
    _, table_h, table_w, c4 = quad2d.shape
    c = c4 // 4
    pf = _col_pack(c4)
    g = gm.shape[1]
    s = d * cfg.tw

    oy, ox, r0 = _origins(ix, iy, cfg, img_h, img_w, table_h, table_w)
    dep_t = _tile_coords(depth_p, cfg)[:, None]  # [B, 1, TY, TX, th, s]
    # ref features channels-on-sublane per tile: [B, TY, TX, th, C, TW]
    ref_t = ref_feature.reshape(b, cfg.ty, cfg.th, cfg.tx, cfg.tw, c)
    ref_t = jnp.transpose(ref_t, (0, 1, 3, 2, 5, 4))

    class _Cfg(NamedTuple):
        th: int
        tw: int
        ty: int
        tx: int
        wwin: int
        hband: int
        hp: int
        wp: int
        hwin: int
        img_h: int
        img_w: int

    kcfg = _Cfg(*cfg, img_h, img_w)

    E = pallas_core.Element
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, cfg.ty, cfg.tx),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, cfg.th, s),
                         lambda bb, ty, tx, *_: (bb, 0, ty, tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cfg.th, c, cfg.tw),
                         lambda bb, ty, tx, *_: (bb, ty, tx, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (E(1), E(cfg.hwin), E(cfg.wwin // pf), E(pf * c4)),
                lambda bb, ty, tx, oy_s, ox_s, r0_s, mat_s: (
                    bb,
                    pl.multiple_of(oy_s[(bb * cfg.ty + ty) * cfg.tx + tx], 8),
                    pl.multiple_of(
                        ox_s[(bb * cfg.ty + ty) * cfg.tx + tx] // pf, 16 // pf
                    ),
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, g), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, 1, 1, cfg.th, s),
                               lambda bb, ty, tx, *_: (bb, 0, ty, tx, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_proj, kcfg, c, g),
        out_shape=jax.ShapeDtypeStruct((b, g, cfg.ty, cfg.tx, cfg.th, s), jnp.float32),
        grid_spec=grid_spec,
    )(oy, ox, r0, mat12.reshape(-1), dep_t, ref_t,
      quad2d.reshape(b, table_h, table_w // pf, pf * c4), gm)
    out = out.reshape(b, g, cfg.ty, cfg.tx, cfg.th, d, cfg.tw)
    out = jnp.transpose(out, (0, 1, 5, 2, 4, 3, 6))
    return out.reshape(b, g, d, h, w)


def _bwd_d_chunk(d: int, tw: int, c4: int, th: int) -> int:
    """Per-grid-step depth chunk for the backward kernel: the d_taps block
    (1, C4, 1, 1, th, dc*tw) must stay ~2.5 MB (bf16) so the window block
    and double buffering fit scoped VMEM. Largest divisor of d with
    (dc*tw) % 128 == 0 under that budget; falls back to the smallest
    128-aligned divisor."""
    budget = int(2.5 * 1024 * 1024)
    best = None
    for dc in range(d, 0, -1):
        if d % dc or (dc * tw) % 128:
            continue
        if best is None:
            best = dc  # smallest budget-violating fallback so far
        if c4 * th * dc * tw * 2 <= budget:
            return dc
        best = dc
    return best if best is not None else d


def _kernel_proj_bwd(cfg, c: int, g: int, dc: int,
                     oy_ref, ox_ref, r0_ref, mat_ref, dep_ref, ref_ref,
                     win_ref, gm_ref, dout_ref, dtaps_ref, dref_ref):
    """Backward of `_kernel_proj` w.r.t. the quad table and ref features.

    Per (batch, tile, d-chunk) grid step, for each ref row: recompute the
    forward coordinates, one-hot and taps IN VMEM (no HBM gather), then

        d_prod  = gm @ dout                     # [C, S]
        d_ref  += fold_d(d_prod * warped)       # [C, TW], revisited out
        d_taps  = (d_prod * ref) * w4_t         # [4C, S] -> HBM (bf16)

    masked to zero where the forward one-hot matched nothing (escaped or
    off-image samples contributed exactly zero, so their cotangent is
    zero). The d-chunk axis is the FASTEST grid dim so the window block
    stays resident across chunks. The quad-table scatter of d_taps and the
    depth/projection stop-gradients (reference: models/module.py:147 grid
    built under no_grad) live in `_wgsp_bwd`."""
    c4 = 4 * c
    k = cfg.hband * cfg.wwin
    bb = pl.program_id(0)
    ty_i = pl.program_id(1)
    tx_i = pl.program_id(2)
    ch = pl.program_id(3)
    t = (bb * pl.num_programs(1) + ty_i) * pl.num_programs(2) + tx_i
    oy = oy_ref[t]
    ox = ox_ref[t]
    j_lin = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    gm = gm_ref[:]  # [C, G] f32

    sc = dc * cfg.tw
    u = (
        jax.lax.broadcasted_iota(jnp.int32, (1, sc), 1) % cfg.tw
        + tx_i * cfg.tw
    ).astype(jnp.float32)[0]
    m = [mat_ref[bb * 12 + i] for i in range(12)]
    wf = jnp.float32(cfg.img_w)
    hf = jnp.float32(cfg.img_h)
    for rr in range(cfg.th):
        r0 = r0_ref[t * cfg.th + rr]
        band_flat = _load_band(win_ref, r0, cfg.hband, cfg.wwin, c4, (0,))
        dep = dep_ref[0, 0, 0, 0, rr, :]  # [SC] f32 (block pre-sliced by ch)
        vv = jnp.float32(ty_i * cfg.th + rr)
        rx = m[0] * u + (m[1] * vv + m[2])
        ry = m[4] * u + (m[5] * vv + m[6])
        rz = m[8] * u + (m[9] * vv + m[10])
        px = rx * dep + m[3]
        py = ry * dep + m[7]
        pz = rz * dep + m[11]
        neg = pz <= 1e-3
        ix = jnp.where(neg, wf, px / pz)
        iy = jnp.where(neg, hf, py / pz)
        w00, w01, w10, w11 = _bilinear_weights(ix, iy, cfg.img_h, cfg.img_w)
        x0f = jnp.floor(ix)
        y0f = jnp.floor(iy)
        qx = jnp.clip(x0f, -1, cfg.img_w - 1).astype(jnp.int32) + 1 - ox
        qy = jnp.clip(y0f, -1, cfg.img_h - 1).astype(jnp.int32) + 1 - oy
        ryy = qy - r0
        li = _band_index(qx, ryy, cfg.hband, cfg.wwin, c4)
        h = (j_lin == li[None, :]).astype(jnp.bfloat16)
        taps = _band_matmul(band_flat, h)  # [C4, SC]
        warped = (taps[0 * c:1 * c] * w00[None, :]
                  + taps[1 * c:2 * c] * w01[None, :]
                  + taps[2 * c:3 * c] * w10[None, :]
                  + taps[3 * c:4 * c] * w11[None, :])  # [C, SC]
        dout = dout_ref[0, :, 0, 0, rr, :]  # [G, SC] f32
        d_prod = jax.lax.dot_general(
            gm, dout, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, SC]
        # forward zeroed escaped samples via the one-hot; zero their
        # cotangents the same way (off-image taps are zeroed by w4 already)
        d_prod = jnp.where(li[None, :] >= 0, d_prod, 0.0)
        contrib = d_prod * warped  # [C, SC]
        acc = contrib[:, 0 * cfg.tw:1 * cfg.tw]
        for j in range(1, dc):
            acc = acc + contrib[:, j * cfg.tw:(j + 1) * cfg.tw]

        @pl.when(ch == 0)
        def _():
            dref_ref[0, 0, 0, rr] = acc

        @pl.when(ch > 0)
        def _():
            dref_ref[0, 0, 0, rr] = dref_ref[0, 0, 0, rr] + acc

        ref_rep = pltpu.repeat(ref_ref[0, 0, 0, rr].astype(jnp.float32), dc, axis=1)
        d_warped = d_prod * ref_rep  # [C, SC]
        for tp, wt in enumerate((w00, w01, w10, w11)):
            dtaps_ref[0, tp * c:(tp + 1) * c, 0, 0, rr, :] = (
                d_warped * wt[None, :]
            ).astype(dtaps_ref.dtype)


def _tile_dout(dout_p, cfg: WindowConfig):
    """[B, G, D, HP, WP] -> [B, G, TY, TX, th, D*TW] (lanes (d, px))."""
    b, g, d, hp, wp = dout_p.shape
    a = dout_p.reshape(b, g, d, cfg.ty, cfg.th, cfg.tx, cfg.tw)
    return jnp.transpose(a, (0, 1, 3, 5, 4, 2, 6)).reshape(
        b, g, cfg.ty, cfg.tx, cfg.th, d * cfg.tw
    )


def _pallas_windowed_proj_bwd(quad2d, mat12, depth_p, ix, iy, ref_feature,
                              gm, dout_p, cfg: WindowConfig,
                              img_h: int, img_w: int):
    """Run the backward kernel; returns (d_taps [B, P, 4C] in table dtype
    with P = (d, h, w) over the PADDED grid, d_ref [B, HP, WP, C] f32)."""
    b, d, hp, wp = depth_p.shape
    _, table_h, table_w, c4 = quad2d.shape
    c = c4 // 4
    pf = _col_pack(c4)
    g = gm.shape[1]
    dc = _bwd_d_chunk(d, cfg.tw, c4, cfg.th)
    nch = d // dc
    sc = dc * cfg.tw
    s = d * cfg.tw

    oy, ox, r0 = _origins(ix, iy, cfg, img_h, img_w, table_h, table_w)
    dep_t = _tile_coords(depth_p, cfg)[:, None]  # [B, 1, TY, TX, th, s]
    ref_t = ref_feature.reshape(b, cfg.ty, cfg.th, cfg.tx, cfg.tw, c)
    ref_t = jnp.transpose(ref_t, (0, 1, 3, 2, 5, 4))
    dout_t = _tile_dout(dout_p.astype(jnp.float32), cfg)

    class _Cfg(NamedTuple):
        th: int
        tw: int
        ty: int
        tx: int
        wwin: int
        hband: int
        hp: int
        wp: int
        hwin: int
        img_h: int
        img_w: int

    kcfg = _Cfg(*cfg, img_h, img_w)

    E = pallas_core.Element
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, cfg.ty, cfg.tx, nch),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, cfg.th, sc),
                         lambda bb, ty, tx, ch, *_: (bb, 0, ty, tx, 0, ch),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cfg.th, c, cfg.tw),
                         lambda bb, ty, tx, ch, *_: (bb, ty, tx, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (E(1), E(cfg.hwin), E(cfg.wwin // pf), E(pf * c4)),
                lambda bb, ty, tx, ch, oy_s, ox_s, r0_s, mat_s: (
                    bb,
                    pl.multiple_of(oy_s[(bb * cfg.ty + ty) * cfg.tx + tx], 8),
                    pl.multiple_of(
                        ox_s[(bb * cfg.ty + ty) * cfg.tx + tx] // pf, 16 // pf
                    ),
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, g), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, 1, 1, cfg.th, sc),
                         lambda bb, ty, tx, ch, *_: (bb, 0, ty, tx, 0, ch),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c4, 1, 1, cfg.th, sc),
                         lambda bb, ty, tx, ch, *_: (bb, 0, ty, tx, 0, ch),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cfg.th, c, cfg.tw),
                         lambda bb, ty, tx, ch, *_: (bb, ty, tx, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    dtaps_t, dref_t = pl.pallas_call(
        functools.partial(_kernel_proj_bwd, kcfg, c, g, dc),
        out_shape=(
            jax.ShapeDtypeStruct(
                (b, c4, cfg.ty, cfg.tx, cfg.th, s), quad2d.dtype
            ),
            jax.ShapeDtypeStruct(
                (b, cfg.ty, cfg.tx, cfg.th, c, cfg.tw), jnp.float32
            ),
        ),
        grid_spec=grid_spec,
    )(oy, ox, r0, mat12.reshape(-1), dep_t, ref_t,
      quad2d.reshape(b, table_h, table_w // pf, pf * c4), gm, dout_t)

    # [B, C4, TY, TX, th, (D, TW)] -> [B, (D, HP, WP), C4]
    dtaps = dtaps_t.reshape(b, c4, cfg.ty, cfg.tx, cfg.th, d, cfg.tw)
    dtaps = jnp.transpose(dtaps, (0, 5, 2, 4, 3, 6, 1))
    dtaps = dtaps.reshape(b, d, hp, wp, c4)
    # [B, TY, TX, th, C, TW] -> [B, HP, WP, C]
    dref = jnp.transpose(dref_t, (0, 1, 3, 2, 5, 4)).reshape(b, hp, wp, c)
    return dtaps, dref


def _kernel_proj_views(cfg, c: int, g: int, nv: int,
                       oy_ref, ox_ref, r0_ref, mat_ref, dep_ref, ref_ref,
                       vw_ref, win_ref, gm_ref, out_ref):
    """`_kernel_proj` fused over the source-view axis: grid (B, TY, TX, V)
    with the VIEW dim innermost, accumulating the view-weighted similarity
    into a REVISITED output block (index map constant in v) —

        out[g, d, px] = sum_v vw[v, px] * sim_v[g, d, px]

    The per-view [B, G, D, H, W] f32 volumes and their XLA weighted-sum
    pass (4x write + 5x read of up to 64 MB per eval call at the bench
    stage-1 geometry) never exist. No scratch, no predicated accumulate —
    the failure mode of the deleted round-2 view-fused kernel (PROGRESS.md)
    — just the standard output-revisiting reduction with @pl.when(v == 0)
    initialization; the depth/ref/gm blocks are constant across v so Mosaic
    keeps them resident. Inference-only: PixelwiseNet needs per-view
    volumes on the first stage-3 iteration, which keeps the per-view
    kernel; training keeps the per-view custom-VJP path.
    """
    c4 = 4 * c
    k = cfg.hband * cfg.wwin
    bb = pl.program_id(0)
    ty_i = pl.program_id(1)
    tx_i = pl.program_id(2)
    v = pl.program_id(3)
    t = ((bb * nv + v) * pl.num_programs(1) + ty_i) * pl.num_programs(2) + tx_i
    oy = oy_ref[t]
    ox = ox_ref[t]
    j_lin = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    gm = gm_ref[:]  # [C, G] f32

    d = dep_ref.shape[-1] // cfg.tw
    dc = _d_chunk(d, cfg.tw)
    sc = dc * cfg.tw
    u = (
        jax.lax.broadcasted_iota(jnp.int32, (1, sc), 1) % cfg.tw
        + tx_i * cfg.tw
    ).astype(jnp.float32)[0]
    m = [mat_ref[(bb * nv + v) * 12 + i] for i in range(12)]
    wf = jnp.float32(cfg.img_w)
    hf = jnp.float32(cfg.img_h)
    first = v == 0
    for rr in range(cfg.th):
        r0 = r0_ref[t * cfg.th + rr]
        band_flat = _load_band(win_ref, r0, cfg.hband, cfg.wwin, c4, (0, 0))
        vw_rep = pltpu.repeat(
            vw_ref[0, 0, 0, 0, rr][None, :].astype(jnp.float32), dc, axis=1
        )  # [1, SC]
        for ch in range(d // dc):
            sl = slice(ch * sc, (ch + 1) * sc)
            dep = dep_ref[0, 0, 0, 0, rr, sl]  # [SC] f32
            vv = jnp.float32(ty_i * cfg.th + rr)
            rx = m[0] * u + (m[1] * vv + m[2])
            ry = m[4] * u + (m[5] * vv + m[6])
            rz = m[8] * u + (m[9] * vv + m[10])
            px = rx * dep + m[3]
            py = ry * dep + m[7]
            pz = rz * dep + m[11]
            neg = pz <= 1e-3
            ix = jnp.where(neg, wf, px / pz)
            iy = jnp.where(neg, hf, py / pz)
            w00, w01, w10, w11 = _bilinear_weights(ix, iy, cfg.img_h, cfg.img_w)
            x0f = jnp.floor(ix)
            y0f = jnp.floor(iy)
            qx = jnp.clip(x0f, -1, cfg.img_w - 1).astype(jnp.int32) + 1 - ox
            qy = jnp.clip(y0f, -1, cfg.img_h - 1).astype(jnp.int32) + 1 - oy
            ryy = qy - r0
            li = _band_index(qx, ryy, cfg.hband, cfg.wwin, c4)
            h = (j_lin == li[None, :]).astype(jnp.bfloat16)
            taps = _band_matmul(band_flat, h)  # [C4, SC]
            warped = (taps[0 * c:1 * c] * w00[None, :]
                      + taps[1 * c:2 * c] * w01[None, :]
                      + taps[2 * c:3 * c] * w10[None, :]
                      + taps[3 * c:4 * c] * w11[None, :])  # [C, SC]
            ref_rep = pltpu.repeat(ref_ref[0, 0, 0, rr].astype(jnp.float32), dc, axis=1)
            prod = warped * ref_rep
            sim = jax.lax.dot_general(
                gm, prod, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, SC]
            sim = sim * vw_rep

            @pl.when(first)
            def _():
                out_ref[0, :, 0, 0, rr, sl] = sim

            @pl.when(~first)
            def _():
                out_ref[0, :, 0, 0, rr, sl] = out_ref[0, :, 0, 0, rr, sl] + sim


def _pallas_windowed_proj_views(quads, mats, depth_p, view_weights_p, ix, iy,
                                ref_feature, gm, cfg: WindowConfig,
                                img_h: int, img_w: int):
    """Views-fused proj variant. quads: [B, V, Ht, Wt, 4C] stacked tables;
    mats: [B, V, 12]; view_weights_p: [B, V, HP, WP] f32 (padded);
    ix/iy: [B, V, D, HP, WP] (origin reductions only).
    Returns the view-weighted similarity SUM [B, G, D, HP, WP] f32."""
    b, nv, d, hp, wp = ix.shape
    _, _, table_h, table_w, c4 = quads.shape
    c = c4 // 4
    pf = _col_pack(c4)
    g = gm.shape[1]
    s = d * cfg.tw

    oy, ox, r0 = _origins(
        ix.reshape(b * nv, d, hp, wp), iy.reshape(b * nv, d, hp, wp),
        cfg, img_h, img_w, table_h, table_w,
    )  # flattened over (b, v, ty, tx) in exactly the kernel's t order
    dep_t = _tile_coords(depth_p, cfg)[:, None]  # [B, 1, TY, TX, th, s]
    ref_t = ref_feature.reshape(b, cfg.ty, cfg.th, cfg.tx, cfg.tw, c)
    ref_t = jnp.transpose(ref_t, (0, 1, 3, 2, 5, 4))
    # [B, V, TY, TX, th, TW]
    vw_t = view_weights_p.reshape(b, nv, cfg.ty, cfg.th, cfg.tx, cfg.tw)
    vw_t = jnp.transpose(vw_t, (0, 1, 2, 4, 3, 5))

    class _Cfg(NamedTuple):
        th: int
        tw: int
        ty: int
        tx: int
        wwin: int
        hband: int
        hp: int
        wp: int
        hwin: int
        img_h: int
        img_w: int

    kcfg = _Cfg(*cfg, img_h, img_w)

    E = pallas_core.Element
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, cfg.ty, cfg.tx, nv),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, cfg.th, s),
                         lambda bb, ty, tx, v, *_: (bb, 0, ty, tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, cfg.th, c, cfg.tw),
                         lambda bb, ty, tx, v, *_: (bb, ty, tx, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, cfg.th, cfg.tw),
                         lambda bb, ty, tx, v, *_: (bb, v, ty, tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (E(1), E(1), E(cfg.hwin), E(cfg.wwin // pf), E(pf * c4)),
                lambda bb, ty, tx, v, oy_s, ox_s, r0_s, mat_s: (
                    bb,
                    v,
                    pl.multiple_of(
                        oy_s[((bb * nv + v) * cfg.ty + ty) * cfg.tx + tx], 8
                    ),
                    pl.multiple_of(
                        ox_s[((bb * nv + v) * cfg.ty + ty) * cfg.tx + tx] // pf,
                        16 // pf,
                    ),
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c, g), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, 1, 1, cfg.th, s),
                               lambda bb, ty, tx, v, *_: (bb, 0, ty, tx, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_proj_views, kcfg, c, g, nv),
        out_shape=jax.ShapeDtypeStruct(
            (b, g, cfg.ty, cfg.tx, cfg.th, s), jnp.float32
        ),
        grid_spec=grid_spec,
    )(oy, ox, r0, mats.reshape(-1), dep_t, ref_t, vw_t,
      quads.reshape(b, nv, table_h, table_w // pf, pf * c4), gm)
    out = out.reshape(b, g, cfg.ty, cfg.tx, cfg.th, d, cfg.tw)
    out = jnp.transpose(out, (0, 1, 5, 2, 4, 3, 6))
    return out.reshape(b, g, d, hp, wp)


def windowed_group_similarity_proj_views(quads, mats, depth, ref_feature, gm,
                                         view_weights, cfg: WindowConfig):
    """View-weighted similarity sum over all source views in ONE kernel.

    Args:
        quads: [B, V, Ht, Wt, 4C] stacked quad tables (bf16 for Pallas).
        mats: [B, V, 12] per-view projection scalars (warp_proj_coeffs).
        depth: [B, D, H, W] f32 depth hypotheses (shared across views).
        ref_feature: [B, H, W, C].
        gm: [C, G] f32 group-mean matrix.
        view_weights: [B, V, H, W] f32 per-view pixel weights.
    Returns:
        [B, G, D, H, W] f32: sum_v view_weights[v] * similarity_v.

    Inference-only (no VJP): used when the per-view visibility weights are
    already known (every evaluation call after the stage-3 first iteration,
    reference: models/patchmatch.py:466-501 reusing pixel-wise weights).
    """
    b, nv = quads.shape[:2]
    _, d, img_h, img_w = depth.shape
    depth_p, _, ref_p = _pad_spatial(depth, depth, ref_feature, cfg)
    vw_p = view_weights
    if (cfg.hp, cfg.wp) != (img_h, img_w):
        vw_p = jnp.pad(
            view_weights,
            ((0, 0), (0, 0), (0, cfg.hp - img_h), (0, cfg.wp - img_w)),
        )
    ix, iy = jax.vmap(
        lambda m: _coords_from_depth(m, depth_p, img_h, img_w),
        in_axes=1, out_axes=1,
    )(mats)  # [B, V, D, HP, WP]
    if (
        os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS")
        or not on_tpu()
        or (d * cfg.tw) % 128 != 0
    ):
        out = jnp.zeros((b, gm.shape[1], d, cfg.hp, cfg.wp), jnp.float32)
        for v in range(nv):
            sim = _jnp_windowed(
                quads[:, v], ix[:, v], iy[:, v], ref_p, gm, cfg, img_h, img_w
            )
            out = out + sim * vw_p[:, v, None, None]
    else:
        out = _pallas_windowed_proj_views(
            quads, mats, depth_p, vw_p.astype(jnp.float32), ix, iy, ref_p,
            gm, cfg, img_h, img_w,
        )
    return out[:, :, :, :img_h, :img_w]


def _wgsp_impl(quad2d, mat12, depth, ref_feature, gm, cfg: WindowConfig):
    _, _, img_h, img_w = depth.shape
    depth_p, _, ref_feature = _pad_spatial(depth, depth, ref_feature, cfg)
    ix, iy = _coords_from_depth(mat12, depth_p, img_h, img_w)
    if (
        os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS")
        or not on_tpu()
        or (depth.shape[1] * cfg.tw) % 128 != 0
    ):
        out = _jnp_windowed(quad2d, ix, iy, ref_feature, gm, cfg, img_h, img_w)
    else:
        out = _pallas_windowed_proj(
            quad2d, mat12, depth_p, ix, iy, ref_feature, gm, cfg, img_h, img_w
        )
    return out[:, :, :, :img_h, :img_w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def windowed_group_similarity_proj(quad2d, mat12, depth, ref_feature, gm,
                                   cfg: WindowConfig):
    """Fused warp + similarity with IN-KERNEL coordinate computation.

    Args:
        quad2d: padded quad table from make_quad_table_2d (bf16 for Pallas).
        mat12: [B, 12] f32 — (src_proj @ inv(ref_proj))[:, :3, :4] flattened
            row-major (see ops.warp.warp_proj_coeffs).
        depth: [B, D, H, W] f32 depth hypotheses on the reference grid.
        ref_proj/ref_feature: [B, H, W, C] reference features.
        gm: [C, G] f32 group-mean matrix.
    Returns:
        [B, G, D, H, W] f32 similarity volume (per view, unweighted).

    Differentiable w.r.t. quad2d and ref_feature (custom VJP: the backward
    kernel recomputes taps in VMEM and emits tap cotangents + ref
    gradients; an XLA scatter-add completes d_quad). depth/mat12 carry NO
    gradient, mirroring the reference's no-grad warp grid (reference:
    models/module.py:147); gm is the constant group-mean matrix.
    """
    return _wgsp_impl(quad2d, mat12, depth, ref_feature, gm, cfg)


def _wgsp_fwd(quad2d, mat12, depth, ref_feature, gm, cfg):
    out = _wgsp_impl(quad2d, mat12, depth, ref_feature, gm, cfg)
    return out, (quad2d, mat12, depth, ref_feature, gm)


def _wgsp_bwd(cfg, residuals, dout):
    quad2d, mat12, depth, ref_feature, gm = residuals
    zeros = (
        jnp.zeros_like(mat12),
        jnp.zeros_like(depth),
        jnp.zeros_like(gm),
    )
    if (
        os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS")
        or not on_tpu()
        or (depth.shape[1] * cfg.tw) % 128 != 0
    ):
        _, vjp = jax.vjp(
            lambda q, r: _wgsp_impl(
                q, jax.lax.stop_gradient(mat12),
                jax.lax.stop_gradient(depth), r, gm, cfg
            ),
            quad2d,
            ref_feature,
        )
        d_quad, d_ref = vjp(dout)
        return (d_quad, zeros[0], zeros[1], d_ref, zeros[2])

    b, d, img_h, img_w = depth.shape
    _, table_h, table_w, c4 = quad2d.shape
    depth_p, _, ref_p = _pad_spatial(depth, depth, ref_feature, cfg)
    ix, iy = _coords_from_depth(mat12, depth_p, img_h, img_w)
    dout_p = dout
    if (cfg.hp, cfg.wp) != (img_h, img_w):
        dout_p = jnp.pad(
            dout,
            ((0, 0), (0, 0), (0, 0), (0, cfg.hp - img_h), (0, cfg.wp - img_w)),
        )
    dtaps, dref_p = _pallas_windowed_proj_bwd(
        quad2d, mat12, depth_p, ix, iy, ref_p, gm, dout_p, cfg, img_h, img_w
    )
    # scatter tap cotangents into the quad table at the forward cells
    # (same lin-index formula as the _jnp_windowed oracle)
    qx, qy, _ = _quad_cells(ix, iy, img_h, img_w)
    lin = jnp.clip(qy, 0, table_h - 1) * table_w + jnp.clip(qx, 0, table_w - 1)
    dtaps = dtaps[:, :, :img_h, :img_w].reshape(b, -1, c4)
    lin = lin[:, :, :img_h, :img_w].reshape(b, -1)
    # accumulate in f32: each quad cell receives up to D x window-overlap
    # colliding contributions, and a bf16 running sum swamps small terms
    # once it is ~256x a contribution (the kernel's bf16 d_taps HBM
    # traffic is fine — only the scatter sum needs the wide accumulator)
    d_quad = jnp.zeros(
        (b, table_h * table_w, c4), jnp.float32
    ).at[jnp.arange(b)[:, None], lin, :].add(dtaps.astype(jnp.float32))
    d_quad = d_quad.reshape(b, table_h, table_w, c4).astype(quad2d.dtype)
    d_ref = dref_p[:, :img_h, :img_w].astype(ref_feature.dtype)
    return (d_quad, zeros[0], zeros[1], d_ref, zeros[2])


windowed_group_similarity_proj.defvjp(_wgsp_fwd, _wgsp_bwd)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or "TPU" in jax.devices()[0].device_kind
    except Exception:
        return False


def windowed_group_similarity(quad2d, ix, iy, ref_feature, gm, cfg: WindowConfig):
    """Fused warp-sample + group-similarity over a 2-D quad table.

    Args:
        quad2d: [B, Ht, Wt, 4C] padded table from make_quad_table_2d (bf16
            storage for the Pallas path).
        ix / iy: [B, D, H, W] unnormalized source-pixel sample coordinates
            (align_corners=True convention, may be off-image).
        ref_feature: [B, H, W, C] reference features.
        gm: [C, G] f32 group-mean matrix.
    Returns:
        [B, G, D, H, W] f32 similarity volume (per view, unweighted).
    """
    _, _, img_h, img_w = ix.shape
    ix, iy, ref_feature = _pad_spatial(ix, iy, ref_feature, cfg)
    if (
        os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS")
        or not on_tpu()
        or (ix.shape[1] * cfg.tw) % 128 != 0
    ):
        out = _jnp_windowed(quad2d, ix, iy, ref_feature, gm, cfg, img_h, img_w)
    else:
        out = _pallas_windowed(quad2d, ix, iy, ref_feature, gm, cfg, img_h, img_w)
    return out[:, :, :, :img_h, :img_w]
