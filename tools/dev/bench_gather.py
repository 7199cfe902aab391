#!/usr/bin/env python
"""Microbenchmarks for gather strategies on TPU (round-2 kernel design).

Timing notes (axon tunnel): block_until_ready is unreliable and there is a
~10 ms/dispatch floor, so each measurement runs the op K times inside ONE
jitted lax.scan (distinct index arrays per step, scalar-chained to defeat
result caching and DCE), and the floor is amortized: t_op = (t_total -
floor) / K.

Run: python tools/dev/bench_gather.py [xla|lane|sublane|wide|onehot|all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_STEPS = 32


def scan_time(op, fixed_args, idx_variants, iters=3):
    """op(*fixed_args, idx) -> array. idx_variants: [K, ...] stacked distinct
    index arrays. Returns seconds per op execution."""

    @jax.jit
    def run(fixed, idxs, salt):
        def body(acc, idx):
            out = op(*fixed, idx)
            return acc + out.ravel()[0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, salt, idxs)
        return acc

    k = jax.tree.leaves(idx_variants)[0].shape[0]
    float(run(fixed_args, idx_variants, jnp.float32(0.0)))  # compile + warm
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(run(fixed_args, idx_variants, jnp.float32(i + 1.0)))
        times.append(time.perf_counter() - t0)
    floor = 0.010
    return max((np.median(times) - floor), 1e-9) / k


def _dev_rand(shape, dtype, seed):
    return jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32).astype(
        dtype
    )


def _dev_randint(shape, lo, hi, seed):
    return jax.random.randint(jax.random.PRNGKey(seed), shape, lo, hi, jnp.int32)


def bench_xla_gather():
    print("== XLA take_along_axis gather (warp-like locality) ==")
    for name, hw, c4, npts in [
        ("stage3-ish", 144 * 108, 256, 96 * 15552),
        ("stage2-ish", 288 * 216, 128, 32 * 62208),
        ("stage1-ish", 576 * 432, 64, 8 * 248832),
    ]:
        for dtype in (jnp.float32, jnp.bfloat16):
            esz = np.dtype(dtype).itemsize
            table = _dev_rand((1, hw, c4), dtype, 7)
            base = jnp.arange(npts, dtype=jnp.int32) % hw
            jit = jax.random.randint(
                jax.random.PRNGKey(1), (K_STEPS, npts), -300, 300, jnp.int32
            )
            idxs = jnp.clip(base[None] + jit, 0, hw - 1)[:, None, :, None]

            def op(t, i):
                return jnp.take_along_axis(t, i, axis=1, mode="promise_in_bounds")

            dt = scan_time(op, (table,), idxs)
            print(
                f"  {name} {np.dtype(dtype).name}: {npts/1e6:.1f}M idx, payload "
                f"{c4}el -> {dt*1e3:.2f} ms = {dt/npts*1e9:.2f} ns/idx, "
                f"{npts*c4*esz/dt/1e9:.0f} GB/s payload"
            )


def _pallas_lane_kernel(win_ref, idx_ref, out_ref):
    out_ref[0] = jnp.take_along_axis(win_ref[0], idx_ref[0], axis=1)


def bench_pallas_lane_gather():
    print("== Pallas in-kernel take_along_axis along lanes [C,128] ==")
    C, L = 32, 128
    NBLK = 8192

    def op(win, idx):
        return pl.pallas_call(
            _pallas_lane_kernel,
            out_shape=jax.ShapeDtypeStruct((NBLK, C, L), jnp.float32),
            grid=(NBLK // 8,),
            in_specs=[
                pl.BlockSpec((8, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (8, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        )(win, idx)

    # NOTE: kernel handles 8 blocks per grid step? No — ref[0] only handles
    # the first. For throughput measurement use grid=NBLK with block 1.
    def op1(win, idx):
        return pl.pallas_call(
            _pallas_lane_kernel,
            out_shape=jax.ShapeDtypeStruct((NBLK, C, L), jnp.float32),
            grid=(NBLK,),
            in_specs=[
                pl.BlockSpec((1, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        )(win, idx)

    win = _dev_rand((NBLK, C, L), jnp.float32, 7)
    idxs = _dev_randint((K_STEPS, NBLK, C, L), 0, L, 3)
    try:
        dt = scan_time(op1, (win,), idxs, iters=2)
        n = NBLK * C * L
        print(
            f"  OK: {dt*1e3:.3f} ms for {n/1e6:.1f}M gathered elements = "
            f"{dt/n*1e9:.3f} ns/el ({n*4/dt/1e9:.0f} GB/s out)"
        )
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")


def bench_pallas_big_lane_gather():
    """Bigger per-block shape: [256, 128] gather along lanes."""
    print("== Pallas take_along_axis lanes, block [256,128] ==")
    C, L = 256, 128
    NBLK = 2048

    def op1(win, idx):
        return pl.pallas_call(
            _pallas_lane_kernel,
            out_shape=jax.ShapeDtypeStruct((NBLK, C, L), jnp.float32),
            grid=(NBLK,),
            in_specs=[
                pl.BlockSpec((1, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, C, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        )(win, idx)

    win = _dev_rand((NBLK, C, L), jnp.float32, 7)
    idxs = _dev_randint((K_STEPS, NBLK, C, L), 0, L, 3)
    try:
        dt = scan_time(op1, (win,), idxs, iters=2)
        n = NBLK * C * L
        print(
            f"  OK: {dt*1e3:.3f} ms for {n/1e6:.1f}M gathered elements = "
            f"{dt/n*1e9:.3f} ns/el ({n*4/dt/1e9:.0f} GB/s out)"
        )
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")


def bench_pallas_sublane_gather():
    print("== Pallas in-kernel take_along_axis along sublanes [8,128] axis=0 ==")
    S, L = 8, 128
    NBLK = 8192

    def kernel(win_ref, idx_ref, out_ref):
        out_ref[0] = jnp.take_along_axis(win_ref[0], idx_ref[0], axis=0)

    def op1(win, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NBLK, S, L), jnp.float32),
            grid=(NBLK,),
            in_specs=[
                pl.BlockSpec((1, S, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, S, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        )(win, idx)

    win = _dev_rand((NBLK, S, L), jnp.float32, 7)
    idxs = _dev_randint((K_STEPS, NBLK, S, L), 0, S, 3)
    try:
        dt = scan_time(op1, (win,), idxs, iters=2)
        n = NBLK * S * L
        print(
            f"  OK: {dt*1e3:.3f} ms for {n/1e6:.1f}M gathered elements = "
            f"{dt/n*1e9:.3f} ns/el ({n*4/dt/1e9:.0f} GB/s out)"
        )
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")


def bench_onehot_matmul():
    print("== Pallas one-hot MXU gather: [P,K] x [K,C4] ==")
    for KW, C4 in [(128, 256), (256, 256), (128, 128), (128, 64)]:
        P = 1024
        NBLK = 512

        def kernel(win_ref, idx_ref, out_ref, KW=KW, C4=C4):
            idx = idx_ref[0]  # [P, 1] int32
            iota = jax.lax.broadcasted_iota(jnp.int32, (P, KW), 1)
            oh = (iota == idx).astype(jnp.float32)
            out_ref[0] = jnp.dot(oh, win_ref[0], preferred_element_type=jnp.float32)

        def op1(win, idx, kernel=kernel, KW=KW, C4=C4):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((NBLK, P, C4), jnp.float32),
                grid=(NBLK,),
                in_specs=[
                    pl.BlockSpec(
                        (1, KW, C4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1, P, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, P, C4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            )(win, idx)

        win = _dev_rand((NBLK, KW, C4), jnp.float32, 7)
        idxs = _dev_randint((K_STEPS, NBLK, P, 1), 0, KW, 3)
        try:
            dt = scan_time(op1, (win,), idxs, iters=2)
            n = NBLK * P
            print(
                f"  K={KW} C4={C4}: {dt*1e3:.3f} ms for {n/1e6:.2f}M pts "
                f"= {dt/n*1e9:.2f} ns/pt ({n*KW*C4*2/dt/1e12:.1f} TFLOP/s)"
            )
        except Exception as e:
            print(f"  K={KW} C4={C4} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "xla"):
        bench_xla_gather()
    if which in ("all", "lane"):
        bench_pallas_lane_gather()
    if which in ("all", "biglane"):
        bench_pallas_big_lane_gather()
    if which in ("all", "sublane"):
        bench_pallas_sublane_gather()
    if which in ("all", "onehot"):
        bench_onehot_matmul()
