#!/usr/bin/env python
"""Head-to-head: warp-sampling + group-correlation formulations per stage.

A: today's path — XLA gather materializes taps [P,4C]; Pallas kernel does
   bilinear+ref-mult+group-matmul.
B: pure-XLA — gather fuses with bilinear+ref-mult (no taps materialized),
   prod [P,C] bf16 materializes, dot_general(gm, prod) -> [G,P] f32.
C: like B but 4-view concat-table gather + in-fusion view-weighted sum, one
   dot at the end (prod accumulated over views before the dot).
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tools.dev.bench_gather import scan_time, _dev_rand, _dev_randint
from patchmatchnet_tpu.ops.pallas import warped_group_similarity


def make_stage(name, hw_src, c, d, hw_ref, g, nview=4):
    rows = hw_src  # quad-table rows
    c4 = 4 * c
    p = d * hw_ref
    table = _dev_rand((1, rows, c4), jnp.bfloat16, 7)
    tables = _dev_rand((1, nview * rows, c4), jnp.bfloat16, 8)
    ref = _dev_rand((1, hw_ref, c), jnp.bfloat16, 9)
    gm = np.zeros((c, g), np.float32)
    cg = c // g
    for i in range(g):
        gm[i * cg : (i + 1) * cg, i] = 1.0 / cg
    gm = jnp.asarray(gm)
    base = jnp.tile(jnp.arange(hw_ref, dtype=jnp.int32) % rows, (d,))

    def mkidx(seed, n=p, r=rows):
        jit = jax.random.randint(jax.random.PRNGKey(seed), (n,), -300, 300, jnp.int32)
        return jnp.clip(base[:n] + jit, 0, r - 1)[None]

    idxs = jnp.stack([mkidx(s) for s in range(8)])
    w4 = _dev_rand((8, 1, 4, p), jnp.float32, 11)
    vw = _dev_rand((1, nview, 1, hw_ref, 1), jnp.float32, 12)

    def var_a(table, ref, gm, idx, w4):
        taps = jnp.take_along_axis(
            table, idx[..., None], axis=1, mode="promise_in_bounds"
        )
        return warped_group_similarity(taps, w4, ref, gm, d)

    def var_b(table, ref, gm, idx, w4):
        taps = jnp.take_along_axis(
            table, idx[..., None], axis=1, mode="promise_in_bounds"
        )
        warped = sum(
            taps[..., t * c : (t + 1) * c] * w4[:, t, :, None] for t in range(4)
        )  # f32 via promotion
        prod = (
            warped.reshape(1, d, hw_ref, c) * ref[:, None]
        ).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            gm.astype(jnp.bfloat16),
            prod.reshape(1, p, c),
            dimension_numbers=(((0,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, 1, P]
        return out

    def var_c(tables, ref, gm, idx, w4):
        # 4-view gather from stacked tables, view-weighted accumulation
        # before the single dot.
        idx4 = jnp.concatenate(
            [idx + v * rows for v in range(nview)], axis=1
        )  # [1, 4P]
        taps = jnp.take_along_axis(
            tables, idx4[..., None], axis=1, mode="promise_in_bounds"
        )  # [1, 4P, 4C]
        w44 = jnp.tile(w4, (1, 1, nview))
        warped = sum(
            taps[..., t * c : (t + 1) * c] * w44[:, t, :, None] for t in range(4)
        )
        prod = warped.reshape(1, nview, d, hw_ref, c) * ref[:, None, None] * vw
        prod_acc = jnp.sum(prod, axis=1).astype(jnp.bfloat16)  # [1, D, HW, C]
        out = jax.lax.dot_general(
            gm.astype(jnp.bfloat16),
            prod_acc.reshape(1, p, c),
            dimension_numbers=(((0,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out

    for label, fn, args in [
        ("A taps+pallas", var_a, (table, ref, gm)),
        ("B fused-gather+dot", var_b, (table, ref, gm)),
        ("C 4view-fused+dot", var_c, (tables, ref, gm)),
    ]:
        def op(t, r, m, pair, fn=fn):
            return fn(t, r, m, pair[0], pair[1])

        pairs = [(idxs[s], w4[s]) for s in range(8)]
        # scan over stacked pair pytree
        stacked = (idxs, w4)

        def op2(t, r, m, pr, fn=fn):
            return fn(t, r, m, pr[0], pr[1])

        dt = scan_time(op2, args, stacked, iters=3)
        mult = nview if label.startswith("C") else 1
        print(f"  {name} {label}: {dt*1e3:.2f} ms ({dt*1e3/mult:.2f} ms/view-eq)")


if __name__ == "__main__":
    # (name, src quad rows, C, D, HW_ref, G)
    make_stage("stage1", 434 * 578, 16, 8, 432 * 576, 4)
    make_stage("stage2", 218 * 290, 32, 16, 216 * 288, 8)
    make_stage("stage3", 110 * 146, 64, 64, 108 * 144, 8)
