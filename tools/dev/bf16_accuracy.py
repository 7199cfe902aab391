#!/usr/bin/env python
"""Quantify bf16-payload accuracy vs the f32 path and the torch reference.

Runs both golden fixtures through compute_dtype=None and bfloat16, reports
per-stage depth error vs (a) the f32 path, (b) the captured torch reference.
Feeds the precision table in PROGRESS.md.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import functools

import numpy as np
import jax
import jax.numpy as jnp

from patchmatchnet_tpu.compat import load_variables
from patchmatchnet_tpu.models import PatchmatchNet

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")


def run(fixture):
    g = np.load(os.path.join(ROOT, "tests", "golden", fixture))
    variables = load_variables(os.path.join(ROOT, "checkpoints", "params_000007.msgpack"))
    drange = float(g["depth_max"] - g["depth_min"])
    outs = {}
    for name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        model = PatchmatchNet(compute_dtype=dtype)

        @functools.partial(jax.jit, static_argnums=())
        def fwd(images, intr, extr, dmin, dmax, noise, model=model):
            return model.apply(
                variables, images, intr, extr, dmin, dmax,
                train=False, init_noise=noise,
            )

        depth, confidence, dp = fwd(
            jnp.asarray(g["images"])[None],
            jnp.asarray(g["intrinsics"])[None],
            jnp.asarray(g["extrinsics"])[None],
            jnp.asarray([g["depth_min"]]),
            jnp.asarray([g["depth_max"]]),
            jnp.asarray(g["noise"]),
        )
        dp = jax.tree.map(np.asarray, dp)
        outs[name] = (np.asarray(depth), np.asarray(confidence), dp)

    print(f"=== {fixture} (depth range {drange:g}) ===")
    for stage, it in [(3, 0), (3, 1), (2, 0), (2, 1), (1, 0), (0, 0)]:
        ref = g[f"stage{stage}_iter{it}"]
        for name in ("f32", "bf16"):
            ours = np.asarray(outs[name][2][stage][it])
            d = np.abs(ours - ref)
            print(
                f"  stage{stage}.it{it} {name:4s} vs torch: "
                f"max {d.max()/drange:.2e} mean {d.mean()/drange:.2e} (rel range)"
            )
        x = np.abs(np.asarray(outs["bf16"][2][stage][it]) - np.asarray(outs["f32"][2][stage][it]))
        print(f"  stage{stage}.it{it} bf16 vs f32  : max {x.max()/drange:.2e} mean {x.mean()/drange:.2e}")
    for name in ("f32", "bf16"):
        cd = np.abs(outs[name][1] - g["confidence"])
        print(f"  confidence {name}: max {cd.max():.2e} median {np.median(cd):.2e} frac>5e-3 {(cd>5e-3).mean():.2e}")


if __name__ == "__main__":
    for fixture in ("forward_96x128.npz", "forward_80x104_n5.npz"):
        run(fixture)
