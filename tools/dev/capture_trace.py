#!/usr/bin/env python
"""Capture a jax.profiler trace + HLO dump of the bench forward pass.

Usage: python tools/dev/capture_trace.py [outdir] [--f32] [--height H] [--width W]
Writes <outdir>/trace/... and <outdir>/hlo.txt, then prints the newest
trace.json.gz path for tools/dev/trace_report.py.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_inputs
from patchmatchnet_tpu.compat import load_variables
from patchmatchnet_tpu.models import PatchmatchNet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/pmtrace")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--height", type=int, default=864)
    ap.add_argument("--width", type=int, default=1152)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "..", "checkpoints", "params_000007.msgpack",
    )
    variables = load_variables(ckpt)
    model = PatchmatchNet(compute_dtype=None if args.f32 else jnp.bfloat16)

    @jax.jit
    def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
        depth, confidence, _ = model.apply(
            variables, images, intrinsics, extrinsics, depth_min, depth_max,
            train=False, init_noise=noise,
        )
        return depth, confidence

    inputs = jax.tree.map(jnp.asarray, build_inputs(1, 5, args.height, args.width))
    noises = [
        jnp.asarray(np.random.default_rng(100 + s).random(np.asarray(inputs[-1]).shape), jnp.float32)
        for s in range(args.iters)
    ]
    jax.block_until_ready(forward(*inputs))

    lowered = forward.lower(*inputs)
    hlo = lowered.compile().as_text()
    os.makedirs(args.outdir, exist_ok=True)
    with open(os.path.join(args.outdir, "hlo.txt"), "w") as f:
        f.write(hlo)

    with jax.profiler.trace(os.path.join(args.outdir, "trace")):
        outs = [forward(*inputs[:-1], noises[i]) for i in range(args.iters)]
        jax.block_until_ready(outs)

    traces = glob.glob(os.path.join(args.outdir, "trace", "**", "*.trace.json.gz"), recursive=True)
    traces.sort(key=os.path.getmtime)
    print(traces[-1] if traces else "NO TRACE")
    print(os.path.join(args.outdir, "hlo.txt"))


if __name__ == "__main__":
    main()
