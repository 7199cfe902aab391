#!/usr/bin/env python
"""Long-horizon f32-vs-bf16 trainer comparison (VERDICT r4 item 4).

Trains PatchmatchNet FROM SCRATCH for --steps steps at the DTU training
config geometry (640x512, N=5, B=2 by default) on a textured synthetic
plane scene with analytic GT (tests/scene_utils), once with the
reference-parity f32 trainer and once with the shipped bf16
mixed-precision trainer (bf16 payloads + windowed-sampler custom VJP,
f32 params/BN/loss/optimizer — ModelConfig.train_precision), same seeds
and data order, and reports:

- loss curves (every step, printed every 10),
- the relative loss divergence band |bf16 - f32| / f32 over the run,
- stage-0 absolute depth error vs the analytic plane GT at the end,
- the windowed-escape counter (must be 0 for the comparison to be clean).

Run on the TPU (jitted); ~0.27 s/step bf16 + ~0.54 s/step f32 at the
default config, plus two compiles. Numbers recorded in PROGRESS.md
(round 5).

Reference anchor: /root/reference/train.py:127-151 (the torch trainer
this mirrors is full f32; the bf16 default rests on this measurement).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests"))

import numpy as np
import jax
import jax.numpy as jnp


def build_batch(height, width, batch, num_views):
    from patchmatchnet_tpu.data import MVSDataset, adjust_sample_dims
    from scene_utils import PLANE_Z, make_synthetic_scene

    tmp = tempfile.mkdtemp()
    make_synthetic_scene(tmp, num_views=max(num_views + 1, batch + num_views),
                         height=height, width=width)
    ds = MVSDataset(tmp, num_views=num_views, image_extension=".png")
    samples = [adjust_sample_dims(ds[i]) for i in range(batch)]
    images = np.stack([s["images"] for s in samples])
    h, w = images.shape[2], images.shape[3]
    return {
        "images": images,
        "intrinsics": np.stack([s["intrinsics"] for s in samples]),
        "extrinsics": np.stack([s["extrinsics"] for s in samples]),
        "depth_min": np.asarray([s["depth_min"] for s in samples], np.float32),
        "depth_max": np.asarray([s["depth_max"] for s in samples], np.float32),
        "depth_gt": np.full((batch, h, w), PLANE_Z, np.float32),
        "mask": np.ones((batch, h, w), dtype=bool),
    }


def run(batch, dtype, steps, log_every):
    from patchmatchnet_tpu.models import PatchmatchNet
    from patchmatchnet_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    import functools

    name = "f32" if dtype is None else "bf16"
    model = PatchmatchNet(compute_dtype=dtype)
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["intrinsics"], batch["extrinsics"],
        batch["depth_min"], batch["depth_max"],
    )
    tx = make_optimizer(1e-3)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx)
    losses, derr, esc = [], [], 0.0
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics, _ = step(state, batch, jax.random.PRNGKey(1000 + i))
        if i == 0:
            float(metrics["loss"])  # force compile before timing
            t0 = time.perf_counter()
        losses.append(float(metrics["loss"]))
        derr.append(float(metrics["depth-error-stage-0"]))
        esc = max(esc, float(metrics["windowed-escapes"]))
        if i % log_every == 0 or i == steps - 1:
            print(
                f"[{name}] step {i:4d} loss {losses[-1]:.4f} "
                f"depth-err {derr[-1]:.3f} esc {esc:.0f}",
                file=sys.stderr, flush=True,
            )
    dt = time.perf_counter() - max(t0, 0)
    print(f"[{name}] {steps} steps, {dt:.0f}s after compile", file=sys.stderr)
    return losses, derr, esc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--num-views", type=int, default=5)
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
    import bench

    bench.enable_compile_cache()
    batch_np = build_batch(args.height, args.width, args.batch, args.num_views)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    f32_loss, f32_err, esc32 = run(batch, None, args.steps, args.log_every)
    bf16_loss, bf16_err, esc16 = run(
        batch, jnp.bfloat16, args.steps, args.log_every
    )

    rel = np.abs(np.asarray(bf16_loss) - np.asarray(f32_loss)) / np.maximum(
        np.asarray(f32_loss), 1e-9
    )
    half = len(rel) // 2
    out = {
        "steps": args.steps,
        "f32_final_loss": round(f32_loss[-1], 5),
        "bf16_final_loss": round(bf16_loss[-1], 5),
        "rel_loss_div_median": round(float(np.median(rel)), 5),
        "rel_loss_div_p95": round(float(np.percentile(rel, 95)), 5),
        "rel_loss_div_max_2nd_half": round(float(rel[half:].max()), 5),
        "f32_final_depth_err": round(f32_err[-1], 4),
        "bf16_final_depth_err": round(bf16_err[-1], 4),
        "windowed_escapes": {"f32": esc32, "bf16": esc16},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
