#!/usr/bin/env python
"""bf16-vs-f32 accuracy on a textured synthetic scene with analytic GT.

Runs the plane scene (tests/scene_utils) at 400x288 N=5 through both
precision modes on the current backend and reports |depth - GT| stats and
inter-mode deltas. This is the decision gate for making bf16 the inference
default (estimator-level, not bit-level: see PROGRESS.md precision table).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests"))

import numpy as np
import jax
import jax.numpy as jnp

from patchmatchnet_tpu.compat import load_variables
from patchmatchnet_tpu.models import PatchmatchNet
from scene_utils import make_synthetic_scene, PLANE_Z
from patchmatchnet_tpu.data import MVSDataset

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")


def main(height=288, width=400, num_views=5):
    tmp = tempfile.mkdtemp()
    make_synthetic_scene(tmp, num_views=num_views, height=height, width=width)
    ds = MVSDataset(tmp, num_views=num_views, image_extension=".png")
    s = ds[0]
    variables = load_variables(os.path.join(ROOT, "checkpoints", "params_000007.msgpack"))

    images = jnp.asarray(s["images"])[None]
    intr = jnp.asarray(s["intrinsics"])[None]
    extr = jnp.asarray(s["extrinsics"])[None]
    dmin = jnp.asarray([s["depth_min"]])
    dmax = jnp.asarray([s["depth_max"]])
    h8, w8 = images.shape[2], images.shape[3]
    noise = jnp.asarray(
        np.random.default_rng(0).random((1, 48, h8 // 8, w8 // 8)), jnp.float32
    )

    gt = float(PLANE_Z)
    results = {}
    for name, dtype in [("f32", None), ("bf16", jnp.bfloat16)]:
        model = PatchmatchNet(compute_dtype=dtype)

        @jax.jit
        def fwd(images, intr, extr, dmin, dmax, noise, model=model):
            d, c, _ = model.apply(
                variables, images, intr, extr, dmin, dmax,
                train=False, init_noise=noise,
            )
            return d, c

        d, c = fwd(images, intr, extr, dmin, dmax, noise)
        d = np.asarray(d)[0]
        results[name] = d
        err = np.abs(d - gt)
        interior = err[16:-16, 16:-16]
        print(
            f"{name}: |depth-GT| mean {err.mean():.4e} median {np.median(err):.4e} "
            f"p99 {np.percentile(err, 99):.4e}; interior mean {interior.mean():.4e} "
            f"max {interior.max():.4e}"
        )
    dd = np.abs(results["bf16"] - results["f32"])
    print(
        f"bf16 vs f32: mean {dd.mean():.4e} median {np.median(dd):.4e} "
        f"p99 {np.percentile(dd, 99):.4e} max {dd.max():.4e} (depth units, Z={gt})"
    )


if __name__ == "__main__":
    main()
