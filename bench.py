#!/usr/bin/env python
"""Benchmark: depth-map inference throughput (MPix/s per chip).

Runs the flagship PatchmatchNet (converted params_000007 checkpoint) at the
DTU evaluation configuration — 1152x864, N=5 views (1 reference + 4 source)
— on the available accelerator, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "MPix/s", "vs_baseline": N}

Baseline: the PatchmatchNet paper reports ~0.25 s per 1152x864 depth map on
an NVIDIA RTX 2080 / V100-class GPU with the PyTorch implementation
(~3.98 MPix/s). vs_baseline is measured throughput divided by that.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPIX_S = 1152 * 864 / 1e6 / 0.25  # ~3.98 MPix/s (V100 PyTorch)


def build_inputs(batch, num_views, height, width, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    images = rng.random((batch, num_views, height, width, 3)).astype(np.float32)
    f = 1.2 * max(height, width)
    k = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    intrinsics = np.broadcast_to(k, (batch, num_views, 3, 3)).copy()
    extrinsics = np.broadcast_to(
        np.eye(4, dtype=np.float32), (batch, num_views, 4, 4)
    ).copy()
    for v in range(num_views):
        angle = 0.06 * (v - (num_views - 1) / 2)
        c, s = np.cos(angle), np.sin(angle)
        extrinsics[:, v, :3, :3] = np.array(
            [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32
        )
        extrinsics[:, v, 0, 3] = 0.5 * (v - (num_views - 1) / 2)
    depth_min = np.full(batch, 425.0, np.float32)
    depth_max = np.full(batch, 935.0, np.float32)
    noise = rng.random((batch, 48, height // 8, width // 8)).astype(np.float32)
    return images, intrinsics, extrinsics, depth_min, depth_max, noise


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=864)
    parser.add_argument("--width", type=int, default=1152)
    parser.add_argument("--num-views", type=int, default=5)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument(
        "--bf16",
        action="store_true",
        help="bfloat16 feature/correlation path (faster, ~1%% mean depth error)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from patchmatchnet_tpu.compat import load_variables
    from patchmatchnet_tpu.models import PatchmatchNet

    ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "checkpoints", "params_000007.msgpack"
    )
    variables = load_variables(ckpt)
    model = PatchmatchNet(compute_dtype=jnp.bfloat16 if args.bf16 else None)

    @jax.jit
    def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
        depth, confidence, _ = model.apply(
            variables,
            images,
            intrinsics,
            extrinsics,
            depth_min,
            depth_max,
            train=False,
            init_noise=noise,
        )
        return depth, confidence

    # Timing strategy: chain `iters` forward passes on-device inside one
    # fori_loop (each iteration's init noise perturbed by the previous
    # iteration's mean depth). This defeats both host<->device tunnel latency
    # and any runtime-level caching of identical dispatches, measuring pure
    # chip throughput. The final scalar is pulled to host to force completion.
    import numpy as np
    from functools import partial

    @partial(jax.jit, static_argnames=("iters",))
    def chained(images, intrinsics, extrinsics, depth_min, depth_max, noise, iters):
        def body(_, carry):
            nz, acc = carry
            depth, confidence = forward(
                images, intrinsics, extrinsics, depth_min, depth_max, nz
            )
            bump = 1e-9 * jnp.mean(depth)
            return nz + bump, acc + jnp.mean(confidence)

        _, acc = jax.lax.fori_loop(0, iters, body, (noise, jnp.float32(0)))
        return acc

    inputs = jax.tree.map(
        jnp.asarray, build_inputs(args.batch, args.num_views, args.height, args.width)
    )
    jax.block_until_ready(inputs)

    if args.verbose:
        print(f"devices: {jax.devices()}", file=sys.stderr)

    t_compile = time.perf_counter()
    np.asarray(chained(*inputs, iters=args.iters))  # compile + first run
    compile_s = time.perf_counter() - t_compile

    # Fresh noise buffer so the timed dispatch can't hit any runtime-level
    # result cache for identical calls.
    noise2 = jnp.asarray(
        np.random.default_rng(123).random(np.asarray(inputs[-1]).shape), jnp.float32
    )
    jax.block_until_ready(noise2)

    start = time.perf_counter()
    np.asarray(chained(*inputs[:-1], noise2, iters=args.iters))
    elapsed = time.perf_counter() - start

    per_map = elapsed / (args.iters * args.batch)
    mpix_s = args.height * args.width / 1e6 / per_map

    if args.verbose:
        print(
            f"compile {compile_s:.1f}s; {per_map * 1e3:.1f} ms per "
            f"{args.width}x{args.height} depth map",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": f"depth-map inference throughput, DTU config "
                f"{args.width}x{args.height} N={args.num_views}",
                "value": round(mpix_s, 3),
                "unit": "MPix/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
