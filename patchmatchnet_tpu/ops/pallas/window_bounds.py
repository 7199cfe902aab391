"""Derived window-band requirements for the windowed similarity sampler.

The windowed kernel (windowed_similarity.py) zeroes any sample whose quad
cell leaves the per-(tile, ref-row) band — the band height `hband` was a
measured envelope constant (HBAND_DEFAULT). This module DERIVES the exact
per-stage requirement from the projection geometry, host-side, before the
forward runs (VERDICT r4 item 3):

For a ref pixel (u, v) and depth d, the source row is

    iy(d) = (ry * d + m7) / (rz * d + m11),   ry = m4*u + m5*v + m6,
                                              rz = m8*u + m9*v + m10,

a Mobius function of d: pz(d) = rz*d + m11 is LINEAR, so if pz > eps at
both range endpoints there is no pole inside [dmin, dmax] and iy is
monotone — its extreme values over every possible hypothesis (all
hypotheses are clamped into [dmin, dmax]: init_random_depth strata and
init_perturbed_depth's clamp, models/patchmatch.py:54-100; propagation
copies in-range neighbor values) are attained AT THE ENDPOINTS. If pz
crosses eps inside the range, iy sweeps to +-inf on the valid side; the
sign of py at the crossing says through which image edge the sweep exits,
which bounds the clipped quad row by 0 or H. Everything else (band start
r0, window origin quantization, clipping) mirrors `_origins` exactly.

The derived band is therefore a sound bound for every hypothesis the
model can generate at that geometry — not a measurement. One extra slack
row absorbs host(numpy)-vs-device f32 rounding at floor boundaries, on
top of the r0 -1 bias that already absorbs device-internal (Mosaic vs
XLA) association differences. The in-graph `escape_count` diagnostic
stays on as the runtime backstop.

Reference context: the torch reference gathers arbitrarily
(/root/reference/models/module.py:130-181) and needs no such bound; the
bound is the price of the windowed TPU kernel's MXU formulation, and
computing it per scene replaces the former measured-constant-or-demote
policy.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
    HWIN_MAX,
    WindowConfig,
    make_config,
)

_EPS = 1e-3  # pz validity threshold, mirrors _coords_from_depth


def _per_mat_ranges(depth_min, depth_max, n: int):
    """Broadcast scalar-or-per-mat depth ranges to [n] float lists."""
    dmins = np.broadcast_to(
        np.asarray(depth_min, np.float64).reshape(-1), (n,)
    )
    dmaxs = np.broadcast_to(
        np.asarray(depth_max, np.float64).reshape(-1), (n,)
    )
    return [float(d) for d in dmins], [float(d) for d in dmaxs]


def stage_mats_np(
    intrinsics: np.ndarray, extrinsics: np.ndarray, stage: int
) -> np.ndarray:
    """Per-source-view [V-1, 12] projection scalars for `stage`, mirroring
    models/net.py's per-stage K scaling + ops/warp.warp_proj_coeffs.

    intrinsics: [N, 3, 3] at full resolution; extrinsics: [N, 4, 4]."""
    scale = 0.5 ** stage
    n = intrinsics.shape[0]
    k = intrinsics.astype(np.float64).copy()
    k[:, :2] *= scale
    proj = np.broadcast_to(np.eye(4), (n, 4, 4)).copy()
    proj[:, :3, :4] = k @ extrinsics.astype(np.float64)[:, :3, :4]
    rel = proj[1:] @ np.linalg.inv(proj[0])
    return rel[:, :3, :4].reshape(n - 1, 12).astype(np.float32)


def _pixel_intervals(mat: np.ndarray, dmin: float, dmax: float,
                     h: int, w: int):
    """Per-pixel quad-cell intervals over ALL depths in [dmin, dmax].

    Returns (qy_lo, qy_hi, qx_lo, qx_hi, active) each [h, w]; `active`
    False means no depth in the range yields a valid (in-image) sample.
    Bounds are exact for pole-free pixels and edge-clipped for sweeps
    through the pz pole (see module docstring)."""
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    m = mat.astype(np.float32)
    ry = m[4] * u + m[5] * v + m[6]
    rz = m[8] * u + m[9] * v + m[10]
    rx = m[0] * u + m[1] * v + m[2]

    qy_e, qx_e, val_e, neg_e = [], [], [], []
    for d in (np.float32(dmin), np.float32(dmax)):
        px = rx * d + m[3]
        py = ry * d + m[7]
        pz = rz * d + m[11]
        neg = pz <= _EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            ix = np.where(neg, np.float32(w), px / pz)
            iy = np.where(neg, np.float32(h), py / pz)
        x0f = np.floor(ix)
        y0f = np.floor(iy)
        valid = (x0f >= -1) & (x0f <= w - 1) & (y0f >= -1) & (y0f <= h - 1)
        qx = np.clip(x0f, -1, w - 1).astype(np.int32) + 1
        qy = np.clip(y0f, -1, h - 1).astype(np.int32) + 1
        qy_e.append(qy)
        qx_e.append(qx)
        val_e.append(valid)
        neg_e.append(neg)

    both_neg = neg_e[0] & neg_e[1]
    active = ~both_neg  # monotone sweep visits the image unless pz<=eps
    # throughout; never-valid pole-free pixels only widen the bound
    qy_lo = np.minimum(qy_e[0], qy_e[1])
    qy_hi = np.maximum(qy_e[0], qy_e[1])
    qx_lo = np.minimum(qx_e[0], qx_e[1])
    qx_hi = np.maximum(qx_e[0], qx_e[1])

    # pole inside the range: the valid-side sweep diverges; exit edge from
    # the sign of py at the pz=eps crossing (py there = ry*dc + m7 with
    # dc = (eps - m11)/rz; equivalently sign(py*rz) at the crossing)
    pole = (neg_e[0] != neg_e[1]) & active
    if pole.any():
        with np.errstate(divide="ignore", invalid="ignore"):
            dc = (np.float32(_EPS) - m[11]) / rz
        py_c = ry * dc + m[7]
        px_c = rx * dc + m[3]
        qy_lo = np.where(pole & (py_c <= 0), 0, qy_lo)
        qy_hi = np.where(pole & (py_c > 0), h, qy_hi)
        qx_lo = np.where(pole & (px_c <= 0), 0, qx_lo)
        qx_hi = np.where(pole & (px_c > 0), w, qx_hi)
    return qy_lo, qy_hi, qx_lo, qx_hi, active


def _edge_pad2(a: np.ndarray, hp: int, wp: int) -> np.ndarray:
    h, w = a.shape
    return np.pad(a, ((0, hp - h), (0, wp - w)), mode="edge")


_BIG = 1 << 20


def _tile_stats(qy_lo, qy_hi, qx_lo, qx_hi, active, cfg: WindowConfig):
    """Per-(tile, row) reductions of the pixel intervals — everything the
    band test needs, independent of hband (so the hband solve reuses it)."""
    act_p = _edge_pad2(active, cfg.hp, cfg.wp)
    ylo = np.where(act_p, _edge_pad2(qy_lo, cfg.hp, cfg.wp), _BIG)
    yhi = np.where(act_p, _edge_pad2(qy_hi, cfg.hp, cfg.wp), -_BIG)
    xlo = np.where(act_p, _edge_pad2(qx_lo, cfg.hp, cfg.wp), _BIG)
    xhi = np.where(act_p, _edge_pad2(qx_hi, cfg.hp, cfg.wp), -_BIG)

    def tiles(a):
        return a.reshape(cfg.ty, cfg.th, cfg.tx, cfg.tw)

    return {
        "ylo_row": tiles(ylo).min(axis=3),   # [TY, th, TX]
        "yhi_row": tiles(yhi).max(axis=3),
        "xlo_tile": tiles(xlo).min(axis=(1, 3)),  # [TY, TX]
        "xhi_tile": tiles(xhi).max(axis=(1, 3)),
    }


def _window_escapes_from_stats(st, cfg: WindowConfig, table_h: int,
                               table_w: int, hband: int,
                               hwin: int) -> Tuple[int, int]:
    """Exact mirror of `_origins` + the in-kernel band test on the tile
    stats. Returns (y_escapes, x_escapes) counts (row/tile-level)."""
    oy = np.clip(st["ylo_row"].min(axis=1), 0, max(table_h - hwin, 0)) & ~7
    ox = np.clip(st["xlo_tile"], 0, max(table_w - cfg.wwin, 0)) & ~15
    r0 = st["ylo_row"] - oy[:, None, :] - 1  # [TY, th, TX]
    r0 = np.clip(r0, 0, hwin - hband)
    start = oy[:, None, :] + r0  # absolute band start
    act = st["yhi_row"] > -_BIG
    # low side: the r0/ox clips can push the band start/window origin past
    # a row's minimum (tall tiles at small bands, image-bottom clamps) —
    # those samples land at ry < 0 / rx < 0 and escape just like the high
    # side (_band_index's unsigned compare)
    y_esc = int(np.sum(act & (
        (st["yhi_row"] - start >= hband) | (st["ylo_row"] - start < 0)
    )))
    act_t = st["xhi_tile"] > -_BIG
    x_esc = int(np.sum(act_t & (
        (st["xhi_tile"] - ox >= cfg.wwin) | (st["xlo_tile"] - ox < 0)
    )))
    return y_esc, x_esc


def _window_escapes(qy_lo, qy_hi, qx_lo, qx_hi, active,
                    cfg: WindowConfig, table_h: int, table_w: int,
                    hband: int, hwin: int) -> Tuple[int, int]:
    st = _tile_stats(qy_lo, qy_hi, qx_lo, qx_hi, active, cfg)
    return _window_escapes_from_stats(st, cfg, table_h, table_w, hband, hwin)


def _solve_band(st, cfg: WindowConfig, table_h: int, table_w: int,
                hwin: int) -> Optional[int]:
    """Smallest escape-free hband for one view's tile stats, or None.
    x escapes are hband-independent, so they fail immediately."""
    if _window_escapes_from_stats(st, cfg, table_h, table_w, hwin, hwin)[1]:
        return None
    # unclipped requirement (r0 = rowmin - 1 exactly)
    oy = np.clip(st["ylo_row"].min(axis=1), 0, max(table_h - hwin, 0)) & ~7
    r0u = np.maximum(st["ylo_row"] - oy[:, None, :] - 1, 0)
    act = st["yhi_row"] > -_BIG
    req = np.where(act, st["yhi_row"] - (oy[:, None, :] + r0u) + 1, 0)
    cand = max(2, int(req.max()))
    # the r0 <= hwin - hband clip can raise the requirement (fixed point);
    # verify and bump — converges in one or two steps in practice
    while cand <= hwin:
        if _window_escapes_from_stats(
            st, cfg, table_h, table_w, cand, hwin
        )[0] == 0:
            return cand
        cand += 1
    return None


def required_band(
    mats: np.ndarray,
    depth_min: float,
    depth_max: float,
    height: int,
    width: int,
    table_h: int,
    table_w: int,
    tw: Optional[int] = None,
) -> Optional[int]:
    """Smallest band height with zero possible escapes at this stage
    geometry (at tile width `tw`), +1 host-vs-device rounding slack row —
    or None when no band <= the window height works (x overflow or extreme
    tilt): the caller should demote that stage to the gather sampler or
    try a narrower tile (the band requirement is the epipolar tilt ACROSS
    the tile, so it shrinks with tw — see derive_stage_windows).

    mats: [V, 12] per-source-view projection scalars (stage_mats_np).
    depth_min/depth_max: scalars, or per-mat arrays broadcastable to [V].
    table_h/table_w: padded quad-table dims for this stage's features."""
    cfg = make_config(height, width, hband=1, tw=tw)
    if cfg is None:
        return None
    hwin = cfg.hwin
    best = 0
    mats = np.asarray(mats, np.float32).reshape(-1, 12)
    dmins, dmaxs = _per_mat_ranges(depth_min, depth_max, len(mats))
    for mat, dmin, dmax in zip(mats, dmins, dmaxs):
        iv = _pixel_intervals(mat, dmin, dmax, height, width)
        st = _tile_stats(*iv, cfg)
        found = _solve_band(st, cfg, table_h, table_w, hwin)
        if found is None:
            return None
        best = max(best, found)
    out = best + 1  # numpy-vs-XLA f32 floor-boundary slack
    return out if out <= hwin else None


# tile-width candidates for the joint (tw, hband) choice: multiples of 16;
# narrower tiles see less epipolar tilt (smaller band, fewer one-hot MACs)
# but pad more columns and dispatch more grid steps
_TW_CANDIDATES = (32, 48, 64, 80, 96, 112, 128)


def derive_stage_window(
    mats: np.ndarray,
    depth_min: float,
    depth_max: float,
    height: int,
    width: int,
    table_h: int,
    table_w: int,
) -> Optional[Tuple[int, int]]:
    """Jointly choose (tw, hband) minimizing the windowed kernel's per-
    sample cost at this geometry, or None when no candidate is sound
    (demote to gather).

    Cost model: the one-hot x band matmul does K = hband * wwin MACs per
    sample per channel, and padded-out columns do the same work as real
    ones — cost ~ hband * wwin * (padded W / W). DMA amplification and
    grid-step overhead favor wider tiles at equal K; ties break wide.

    depth_min/depth_max: scalars or per-mat arrays broadcastable to [V]."""
    mats = np.asarray(mats, np.float32).reshape(-1, 12)
    dmins, dmaxs = _per_mat_ranges(depth_min, depth_max, len(mats))
    ivs = [
        _pixel_intervals(m, dmin, dmax, height, width)
        for m, dmin, dmax in zip(mats, dmins, dmaxs)
    ]  # per-pixel intervals are tile-width independent: hoisted
    best = None
    best_cost = None
    for tw in _TW_CANDIDATES:
        if width < 16 or tw > max(width, 16) + 15:
            continue
        cfg = make_config(height, width, hband=1, tw=tw)
        if cfg is None:
            continue
        band = 0
        for iv in ivs:
            st = _tile_stats(*iv, cfg)
            found = _solve_band(st, cfg, table_h, table_w, cfg.hwin)
            if found is None:
                band = None
                break
            band = max(band, found)
        if band is None:
            continue
        band += 1  # numpy-vs-XLA f32 floor-boundary slack
        if band > cfg.hwin:
            continue
        cost = band * cfg.wwin * (cfg.wp / max(width, 1))
        if best_cost is None or cost < best_cost - 1e-9 or (
            abs(cost - best_cost) <= 1e-9 and tw > best[0]
        ):
            best = (tw, band)
            best_cost = cost
    return best


def _table_dims(hs: int, ws: int) -> Tuple[int, int]:
    """Padded quad-table dims, mirroring make_quad_table_2d."""
    hq, wq = hs + 1, ws + 1
    return max(-(-hq // 8) * 8, HWIN_MAX), -(-wq // 16) * 16


def derive_stage_bands(
    intrinsics: np.ndarray,
    extrinsics: np.ndarray,
    depth_min: float,
    depth_max: float,
    height: int,
    width: int,
    stages: Sequence[int] = (1, 2, 3),
) -> dict:
    """Per-stage derived band heights at the DEFAULT tile width.

    Returns {stage: hband or None}; None = windowed sampler unsound at any
    band height for that tile width (try derive_stage_windows, which also
    searches tile widths, or demote that stage to gather). `height`/
    `width` are the FULL (padded) image dims the model will see."""
    out = {}
    for stage in stages:
        hs, ws = height >> stage, width >> stage
        mats = stage_mats_np(
            np.asarray(intrinsics, np.float32),
            np.asarray(extrinsics, np.float32),
            stage,
        )
        table_h, table_w = _table_dims(hs, ws)
        out[stage] = required_band(
            mats, depth_min, depth_max, hs, ws, table_h, table_w
        )
    return out


def derive_stage_windows(
    intrinsics: np.ndarray,
    extrinsics: np.ndarray,
    depth_min: float,
    depth_max: float,
    height: int,
    width: int,
    stages: Sequence[int] = (1, 2, 3),
) -> dict:
    """Per-stage derived (tile width, band height) for a scene geometry —
    the full window-soundness derivation (VERDICT r4 item 3).

    Returns {stage: (tw, hband) or None}; None = no candidate tile width
    admits a sound band (demote that stage to the gather sampler)."""
    out = {}
    for stage in stages:
        hs, ws = height >> stage, width >> stage
        mats = stage_mats_np(
            np.asarray(intrinsics, np.float32),
            np.asarray(extrinsics, np.float32),
            stage,
        )
        table_h, table_w = _table_dims(hs, ws)
        out[stage] = derive_stage_window(
            mats, depth_min, depth_max, hs, ws, table_h, table_w
        )
    return out


def derive_batch_windows(
    intrinsics: np.ndarray,
    extrinsics: np.ndarray,
    depth_min: np.ndarray,
    depth_max: np.ndarray,
    height: int,
    width: int,
    stages: Sequence[int] = (1, 2, 3),
) -> dict:
    """Per-stage derived (tw, hband) sound for EVERY sample of a batch —
    the production entry the inference DepthEstimator derives from.

    intrinsics: [B, N, 3, 3]; extrinsics: [B, N, 4, 4];
    depth_min/depth_max: [B]. Returns {stage: (tw, hband) or None}."""
    intrinsics = np.asarray(intrinsics, np.float32)
    extrinsics = np.asarray(extrinsics, np.float32)
    dmin = np.asarray(depth_min, np.float64).reshape(-1)
    dmax = np.asarray(depth_max, np.float64).reshape(-1)
    b, n = intrinsics.shape[0], intrinsics.shape[1]
    out = {}
    for stage in stages:
        hs, ws = height >> stage, width >> stage
        mats = np.concatenate(
            [stage_mats_np(intrinsics[i], extrinsics[i], stage)
             for i in range(b)]
        )  # [B * (N-1), 12]
        dmins = np.repeat(dmin, n - 1)
        dmaxs = np.repeat(dmax, n - 1)
        table_h, table_w = _table_dims(hs, ws)
        out[stage] = derive_stage_window(
            mats, dmins, dmaxs, hs, ws, table_h, table_w
        )
    return out
