#!/usr/bin/env python
"""Decompose the windowed similarity kernel's cost at a given stage shape.

Monkeypatches ablated kernel bodies into ops.pallas.windowed_similarity and
times each variant with K scan iterations inside one jit (distinct inputs
per step; a chained scalar forces execution — block_until_ready is
unreliable on the axon tunnel):

  full       the production kernel
  no_onehot  one-hot build replaced by a broadcast constant (keeps matmuls)
  no_matmul  taps matmul + one-hot replaced by zeros (keeps bilinear+sim)
  no_body    kernel writes zeros (leaves window DMA + grid overhead)

Usage: python tools/dev/bench_windowed_kernel.py [--stage 1|2|3] [--iters 20]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import patchmatchnet_tpu.ops.pallas.windowed_similarity as ws

STAGES = {  # (h, w, c, g, d) at the 1152x864 bench config
    1: (576, 432, 16, 4, 8),
    2: (288, 216, 32, 8, 16),
    3: (144, 108, 64, 8, 48),
}


def ablated_kernel(variant, cfg, c, g, *refs):
    (oy_ref, ox_ref, r0_ref, cxy_ref, ref_ref, win_ref, gm_ref, out_ref) = refs
    if variant == "no_body":
        d = cxy_ref.shape[-1] // cfg.tw
        for rr in range(cfg.th):
            out_ref[0, :, 0, 0, rr, :] = jnp.zeros(
                (g, d * cfg.tw), jnp.float32
            )
        return
    # reimplement the body with switchable pieces
    c4 = 4 * c
    k = cfg.hband * cfg.wwin
    t = (pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)) * pl.num_programs(2) + pl.program_id(2)
    oy = oy_ref[t]
    ox = ox_ref[t]
    j_lin = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    gm = gm_ref[:]
    d = cxy_ref.shape[-1] // cfg.tw
    dc = ws._d_chunk(d, cfg.tw)
    sc = dc * cfg.tw
    from jax.experimental.pallas import tpu as pltpu

    for rr in range(cfg.th):
        r0 = r0_ref[t * cfg.th + rr]
        band = win_ref[0, pl.ds(r0, cfg.hband)]
        band_flat = band.reshape(k, c4)
        for ch in range(d // dc):
            sl = slice(ch * sc, (ch + 1) * sc)
            ix = cxy_ref[0, 0, 0, 0, rr, sl]
            iy = cxy_ref[0, 1, 0, 0, rr, sl]
            w00, w01, w10, w11 = ws._bilinear_weights(ix, iy, cfg.img_h, cfg.img_w)
            if variant == "no_matmul":
                taps = jnp.zeros((c4, sc), jnp.float32)
            else:
                if variant == "no_onehot":
                    h = jnp.full((k, sc), jnp.bfloat16(1.0 / k))
                else:
                    x0f = jnp.floor(ix)
                    y0f = jnp.floor(iy)
                    qx = jnp.clip(x0f, -1, cfg.img_w - 1).astype(jnp.int32) + 1 - ox
                    qy = jnp.clip(y0f, -1, cfg.img_h - 1).astype(jnp.int32) + 1 - oy
                    ry = qy - r0
                    li = jnp.where((qx >= 0) & (qx < cfg.wwin), ry * cfg.wwin + qx, -1)
                    h = (j_lin == li[None, :]).astype(jnp.bfloat16)
                taps = jax.lax.dot_general(
                    band_flat, h,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            warped = (taps[0 * c:1 * c] * w00[None, :]
                      + taps[1 * c:2 * c] * w01[None, :]
                      + taps[2 * c:3 * c] * w10[None, :]
                      + taps[3 * c:4 * c] * w11[None, :])
            ref_rep = pltpu.repeat(ref_ref[0, 0, 0, rr].astype(jnp.float32), dc, axis=1)
            prod = warped * ref_rep
            sim = jax.lax.dot_general(
                gm, prod, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, :, 0, 0, rr, sl] = sim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    h, w, c, g, d = STAGES[args.stage]

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.bfloat16)
    ref = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.bfloat16)
    gm = np.zeros((c, g), np.float32)
    for gi in range(g):
        gm[gi * (c // g):(gi + 1) * (c // g), gi] = g / c
    gm = jnp.asarray(gm)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    ix0 = np.broadcast_to(xx + 3.0, (1, d, h, w)).copy()
    iy0 = np.broadcast_to(yy + 1.0, (1, d, h, w)).copy()
    ix0 += 0.13 * np.arange(d, dtype=np.float32)[None, :, None, None]
    quad = ws.make_quad_table_2d(feat)
    cfg = ws.make_config(h, w)
    print(f"stage {args.stage}: {h}x{w} C={c} D={d} cfg={cfg}")

    orig = ws._kernel
    for variant in ("full", "no_onehot", "no_matmul", "no_body"):
        if variant == "full":
            ws._kernel = orig
        else:
            ws._kernel = functools.partial(ablated_kernel, variant)

        @jax.jit
        def run(ix, iy):
            def step(carry, eps):
                out = ws.windowed_group_similarity(
                    quad, ix + eps, iy, ref, gm, cfg)
                return carry + out[0, 0, 0, 0, 0], None
            s, _ = jax.lax.scan(step, jnp.float32(0),
                                jnp.linspace(0.0, 0.05, args.iters))
            return s

        ixj = jnp.asarray(ix0)
        iyj = jnp.asarray(iy0)
        float(run(ixj + 1.0, iyj))  # compile + warm (distinct args: the
        t0 = time.perf_counter()    # runtime result-caches identical calls)
        float(run(ixj, iyj))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {variant:10s}: {dt:7.3f} ms/call")
    ws._kernel = orig


if __name__ == "__main__":
    main()
