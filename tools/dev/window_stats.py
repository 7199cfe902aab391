#!/usr/bin/env python
"""Measure per-tile source-window extents for the windowed-sampling kernel
design: for each warp (stage/iteration/view) of the bench forward, compute the
bbox of in-image sample coordinates per pixel tile (optionally per d-chunk),
and report window-size distributions.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

import patchmatchnet_tpu.ops.warp as warp_mod
from bench import build_inputs
from patchmatchnet_tpu.compat import load_variables
from patchmatchnet_tpu.models import PatchmatchNet

CAPTURED = []

_orig_warp_grid = warp_mod.warp_grid


def capture_warp_grid(src_proj, ref_proj, depth_samples, src_h, src_w):
    grid = _orig_warp_grid(src_proj, ref_proj, depth_samples, src_h, src_w)
    # stash the TRACED array at trace time; returned as an extra jit output
    CAPTURED.append((grid, src_h, src_w))
    return grid


def analyze(grid, src_h, src_w, tile_h, tile_w, d_chunk):
    """grid: [B, D, H, W, 2] normalized align_corners=True coords."""
    b, d, h, w, _ = grid.shape
    ix = (grid[..., 0] + 1.0) * 0.5 * (src_w - 1)
    iy = (grid[..., 1] + 1.0) * 0.5 * (src_h - 1)
    # in-image = any tap weight nonzero: floor coords in [-1, size-1]
    inim = (ix >= -1) & (ix <= src_w) & (iy >= -1) & (iy <= src_h)
    th = -(-h // tile_h)
    tw = -(-w // tile_w)
    dc = -(-d // d_chunk)
    pad_h = th * tile_h - h
    pad_w = tw * tile_w - w
    pad_d = dc * d_chunk - d

    def tiled(x, fill):
        x = np.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w)), constant_values=fill)
        x = x.reshape(b, dc, d_chunk, th, tile_h, tw, tile_w)
        return np.transpose(x, (0, 1, 3, 5, 2, 4, 6)).reshape(b, dc * th * tw, -1)

    ixt, iyt, maskt = tiled(ix, np.nan), tiled(iy, np.nan), tiled(inim, False)
    ixt = np.where(maskt, ixt, np.nan)
    iyt = np.where(maskt, iyt, np.nan)
    with np.errstate(all="ignore"):
        wx = np.nanmax(ixt, axis=-1) - np.nanmin(ixt, axis=-1)
        wy = np.nanmax(iyt, axis=-1) - np.nanmin(iyt, axis=-1)
    valid = ~np.isnan(wx)
    wx, wy = wx[valid], wy[valid]
    if wx.size == 0:
        return None
    q = lambda a: [round(float(np.percentile(a, p)), 1) for p in (50, 90, 99, 99.9)] + [round(float(a.max()), 1)]
    return {"n_tiles": int(wx.size), "wx(p50/90/99/99.9/max)": q(wx), "wy": q(wy)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=864)
    ap.add_argument("--width", type=int, default=1152)
    args = ap.parse_args()

    warp_mod.warp_grid = capture_warp_grid
    # patchmatch.py imports warp_taps from ops.warp; warp_taps -> warp_coords -> warp_grid (module-global lookup) — patch works.

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                        "checkpoints", "params_000007.msgpack")
    variables = load_variables(ckpt)
    model = PatchmatchNet(compute_dtype=jnp.bfloat16)

    @jax.jit
    def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
        CAPTURED.clear()
        depth = model.apply(variables, images, intrinsics, extrinsics,
                            depth_min, depth_max, train=False, init_noise=noise)[0]
        return depth, [g for g, _, _ in CAPTURED]

    inputs = jax.tree.map(jnp.asarray, build_inputs(1, 5, args.height, args.width))
    _, grids = forward(*inputs)
    jax.block_until_ready(grids)
    meta = [(sh, sw) for _, sh, sw in CAPTURED]

    print(f"captured {len(grids)} warp grids")
    # group identical (D, H, W) in call order: views cycle fastest
    seen = {}
    for grid, (sh, sw) in zip(grids, meta):
        grid = np.asarray(grid)
        key = grid.shape[1:4]
        seen.setdefault(key, []).append((grid, sh, sw))
    for key, items in seen.items():
        d, h, w = key
        print(f"\n=== warp D={d} {w}x{h} ({len(items)} calls) ===")
        for tile_h, tile_w, d_chunk in [(8, 128, d), (8, 128, 8), (4, 128, 8),
                                        (8, 256, 8), (16, 128, 16), (8, 128, 1)]:
            if d_chunk > d:
                continue
            # analyze first and last call (first/last view)
            stats = analyze(items[0][0], items[0][1], items[0][2], tile_h, tile_w, d_chunk)
            print(f" tile {tile_h}x{tile_w} dc={d_chunk}: {stats}")


if __name__ == "__main__":
    main()
