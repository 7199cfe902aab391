#!/usr/bin/env python
"""Capture a jax.profiler trace + HLO dump of the TRAIN step at the DTU
training config (640x512, N=5, B=2 — reference: train.py:127-151).

Usage: python tools/dev/capture_train_trace.py [outdir] [--height H] [--width W]
Writes <outdir>/trace/... and <outdir>/hlo.txt, then prints the newest
trace.json.gz path for tools/dev/trace_report.py.
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/pmtrain")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from bench import build_inputs, enable_compile_cache
    from patchmatchnet_tpu.models import PatchmatchNet
    from patchmatchnet_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    enable_compile_cache()
    b, n, h, w = args.batch, 5, args.height, args.width
    rng_np = np.random.default_rng(0)
    images, intrinsics, extrinsics, depth_min, depth_max, _ = build_inputs(b, n, h, w)
    batch = {
        "images": images,
        "intrinsics": intrinsics,
        "extrinsics": extrinsics,
        "depth_min": depth_min,
        "depth_max": depth_max,
        "depth_gt": (rng_np.random((b, h, w)) * 510 + 425).astype(np.float32),
        "mask": np.ones((b, h, w), dtype=bool),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = PatchmatchNet()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["intrinsics"], batch["extrinsics"],
        batch["depth_min"], batch["depth_max"], train=True,
    )
    tx = make_optimizer(1e-3)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx)

    rng = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    state, metrics, _ = step(state, batch, rng)
    float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # warm
    for i in range(2):
        state, metrics, _ = step(state, batch, jax.random.fold_in(rng, i))
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics, _ = step(state, batch, jax.random.fold_in(rng, 50 + i))
    float(metrics["loss"])
    per = (time.perf_counter() - t0) / args.iters
    print(f"{per*1e3:.0f} ms/step ({args.batch/per:.2f} samples/s)", file=sys.stderr)

    os.makedirs(args.outdir, exist_ok=True)
    try:
        import inspect

        from patchmatchnet_tpu.train import loop as _loop  # noqa: F401
    except Exception:
        pass
    lowered_txt = None
    try:
        lowered_txt = step.lower(state, batch, rng).compile().as_text()
    except Exception as exc:
        print(f"hlo dump failed: {exc}", file=sys.stderr)
    if lowered_txt:
        with open(os.path.join(args.outdir, "hlo.txt"), "w") as f:
            f.write(lowered_txt)

    with jax.profiler.trace(os.path.join(args.outdir, "trace")):
        outs = []
        for i in range(args.iters):
            state, metrics, _ = step(state, batch, jax.random.fold_in(rng, 100 + i))
            outs.append(metrics["loss"])
        jax.block_until_ready(outs)

    traces = glob.glob(
        os.path.join(args.outdir, "trace", "**", "*.trace.json.gz"), recursive=True
    )
    traces.sort(key=os.path.getmtime)
    print(traces[-1] if traces else "NO TRACE")
    print(os.path.join(args.outdir, "hlo.txt"))


if __name__ == "__main__":
    main()
