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
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MPIX_S = 1152 * 864 / 1e6 / 0.25  # ~3.98 MPix/s (V100 PyTorch)

_PROCESS_START = time.monotonic()


def enable_compile_cache():
    """Persistent XLA compile cache under the repo (this box has ONE CPU
    core, so cold compiles of the full forward/train step cost minutes;
    warm-cache reruns cost seconds). Harmless when cold."""
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax"),
    )
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


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


def bench_train(args, emit=True):
    """Training-step throughput (samples/s) at the DTU training config
    (640x512, N=5, B=2 by default). Returns samples/s."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from patchmatchnet_tpu.models import PatchmatchNet
    from patchmatchnet_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    b, n, h, w = args.batch, args.num_views, args.height, args.width
    rng_np = np.random.default_rng(0)
    images, intrinsics, extrinsics, depth_min, depth_max, _ = build_inputs(
        b, n, h, w
    )
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

    # the driver's default trainer is bf16 mixed precision (f32 params/BN/
    # loss/optimizer; ModelConfig.train_precision) — bench it as shipped;
    # --train-f32 measures the reference-parity f32 trainer instead
    model = PatchmatchNet(
        compute_dtype=None if getattr(args, "train_f32", False) else jnp.bfloat16
    )
    # jit the init: eager init dispatches every layer op individually, which
    # costs minutes of round-trip latency on the tunneled TPU (measured; the
    # same lesson as the multichip dryrun, parallel/dryrun.py)
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["intrinsics"], batch["extrinsics"],
        batch["depth_min"], batch["depth_max"],
    )
    tx = make_optimizer(1e-3)
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx)

    rng = jax.random.PRNGKey(2)
    t_compile = time.perf_counter()
    state, metrics, _ = step(state, batch, rng)
    # force execution (block_until_ready is unreliable on the axon tunnel)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t_compile

    for i in range(args.warmup):
        state, metrics, _ = step(state, batch, jax.random.fold_in(rng, i))
    float(metrics["loss"])

    start = time.perf_counter()
    for i in range(args.iters):
        state, metrics, _ = step(state, batch, jax.random.fold_in(rng, 100 + i))
    float(metrics["loss"])
    elapsed = time.perf_counter() - start
    per_step = elapsed / args.iters
    samples_s = args.batch / per_step

    if args.verbose:
        print(
            f"compile {compile_s:.1f}s; {per_step*1e3:.1f} ms/step at "
            f"{w}x{h} N={n} B={b}",
            file=sys.stderr,
        )
    # Round-1 reference point: ~1.2 s/step (1.64 samples/s) at this config.
    if emit:
        print(
            json.dumps(
                {
                    "metric": f"train-step throughput, DTU config {w}x{h} "
                    f"N={n} B={args.batch}",
                    "value": round(samples_s, 3),
                    "unit": "samples/s",
                    "vs_baseline": round(samples_s / 1.64, 3),
                }
            )
        )
    return samples_s


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=864)
    parser.add_argument("--width", type=int, default=1152)
    parser.add_argument("--num-views", type=int, default=5)
    parser.add_argument("--batch", type=int, default=1)
    # the axon tunnel shows multi-ms dispatch jitter: 20 iterations keeps the
    # measurement repeatable to ~0.1% (5 iters swung +-30% run to run)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument(
        "--train",
        action="store_true",
        help="benchmark the training step (defaults switch to 640x512 B=2)",
    )
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument(
        "--no-train-metric",
        action="store_true",
        help="skip the train-step throughput side metric in the JSON line",
    )
    parser.add_argument(
        "--no-tanks-metric",
        action="store_true",
        help="skip the second-geometry (Tanks 1056x1920 N=7) side metric",
    )
    parser.add_argument(
        "--no-derive-windows",
        dest="derive_windows",
        action="store_false",
        default=True,
        help="disable the per-scene windowed-sampler (tw, hband) derivation "
        "(ops/pallas/window_bounds; the production DepthEstimator default) "
        "and use the measured-envelope defaults instead",
    )
    parser.add_argument(
        "--train-f32",
        action="store_true",
        help="benchmark the f32 (reference-parity) trainer instead of the "
        "default bf16 mixed-precision trainer",
    )
    parser.add_argument(
        "--no-diagnostics",
        dest="diagnostics",
        action="store_false",
        default=True,
        help="drop the diagnostics collection from the measured forward. "
        "Default ON: the production DepthEstimator path requests "
        "mutable=['diagnostics'] for the windowed-sampler escape guard "
        "(infer/depth.py), so the default bench measures that program",
    )
    parser.add_argument(
        "--bf16",
        action="store_true",
        default=True,
        help="bfloat16 payload path with f32 weights/accumulation (default; "
        "validated: median depth delta vs f32 is ~0.03%% of depth, ~30x "
        "below estimator noise — see PROGRESS.md precision table)",
    )
    parser.add_argument(
        "--f32",
        dest="bf16",
        action="store_false",
        help="full-f32 path (bit-close to the PyTorch reference)",
    )
    args = parser.parse_args()
    enable_compile_cache()

    if args.train:
        if args.height == 864 and args.width == 1152:
            args.height, args.width = 512, 640
        if args.batch == 1:
            args.batch = 2
        bench_train(args)
        return

    import jax
    import jax.numpy as jnp

    from patchmatchnet_tpu.compat import load_variables
    from patchmatchnet_tpu.models import PatchmatchNet

    ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "checkpoints", "params_000007.msgpack"
    )
    variables = load_variables(ckpt)
    model = PatchmatchNet(compute_dtype=jnp.bfloat16 if args.bf16 else None)

    mpix_s = _bench_forward(args, model, variables)

    record = {
        "metric": f"depth-map inference throughput, DTU config "
        f"{args.width}x{args.height} N={args.num_views}",
        "value": round(mpix_s, 3),
        "unit": "MPix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }
    _emit_side_metrics(args, model, variables, record)
    print(json.dumps(record), flush=True)


def _derived_window_env(args):
    """Per-stage derived (tw, hband) env overrides for the bench geometry —
    the same derivation the production DepthEstimator performs per shape
    (infer/depth.py). Returns the env dict (empty when derivation is off,
    the model is f32/gather, or the derivation declines)."""
    if not (args.derive_windows and args.bf16):
        return {}
    try:
        from patchmatchnet_tpu.ops.pallas.window_bounds import (
            derive_batch_windows,
        )

        _, intr, extr, dmin, dmax, _ = build_inputs(
            args.batch, args.num_views, args.height, args.width
        )
        spec = derive_batch_windows(
            intr, extr, dmin, dmax, args.height, args.width
        )
        return {
            f"PATCHMATCHNET_TPU_WIN_S{s}": f"{v[0]},{v[1]}"
            for s, v in spec.items()
            if v
        }
    except Exception as exc:  # never break the metric on a derivation bug
        print(f"window derivation failed: {exc}", file=sys.stderr)
        return {}


def _bench_forward(args, model, variables):
    """Timed forward benchmark at args' geometry; returns MPix/s."""
    import jax
    import jax.numpy as jnp

    env = _derived_window_env(args)
    prev = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return _bench_forward_inner(args, model, variables)
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _bench_forward_inner(args, model, variables):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
        if args.diagnostics:
            # production parity: DepthEstimator requests the diagnostics
            # collection (escape guard) on every batch — infer/depth.py:68-89
            (depth, confidence, _), diag = model.apply(
                variables,
                images,
                intrinsics,
                extrinsics,
                depth_min,
                depth_max,
                train=False,
                init_noise=noise,
                mutable=["diagnostics"],
            )
            escapes = sum(
                jax.tree.leaves(diag.get("diagnostics", {})),
                jnp.zeros((), jnp.int32),
            )
            return depth, confidence, escapes
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

    # Timing strategy: sequential blocked calls, each with a DISTINCT
    # pre-staged noise buffer (the runtime result-caches identical
    # dispatches). Per-call blocking includes some host<->device round-trip
    # latency, so the reported throughput is a conservative lower bound.
    import numpy as np

    jit_forward = jax.jit(forward)
    inputs = jax.tree.map(
        jnp.asarray, build_inputs(args.batch, args.num_views, args.height, args.width)
    )
    # ONE staged buffer for all per-iteration noises, sliced on device:
    # per-array host->device transfers cost seconds each on the tunneled
    # TPU (measured 142 s for inputs + 23 noise arrays staged one by one)
    n_noise = args.warmup + args.iters
    noise_shape = np.asarray(inputs[-1]).shape
    noise_stack = jnp.asarray(
        np.stack(
            [
                np.random.default_rng(100 + s).random(noise_shape, np.float32)
                for s in range(n_noise)
            ]
        )
    )
    noises = [noise_stack[s] for s in range(n_noise)]
    jax.block_until_ready((inputs, noises))

    if args.verbose:
        print(f"devices: {jax.devices()}", file=sys.stderr)

    t_compile = time.perf_counter()
    jax.block_until_ready(jit_forward(*inputs))
    compile_s = time.perf_counter() - t_compile

    for i in range(args.warmup):
        jax.block_until_ready(jit_forward(*inputs[:-1], noises[i]))

    # Latency: median of individually-blocked calls (includes one host
    # round trip each — conservative).
    times = []
    for i in range(args.iters):
        start = time.perf_counter()
        jax.block_until_ready(jit_forward(*inputs[:-1], noises[args.warmup + i]))
        times.append(time.perf_counter() - start)
    latency = float(np.median(times))

    # Throughput: dispatch all iterations (distinct inputs), block once —
    # device-pipelined, amortizes the host round trip.
    start = time.perf_counter()
    outs = [
        jit_forward(*inputs[:-1], noises[args.warmup + i])
        for i in range(args.iters)
    ]
    jax.block_until_ready(outs)
    elapsed = time.perf_counter() - start
    if args.verbose:
        print(
            f"single-call latency median {latency * 1e3:.1f} ms; pipelined "
            f"{elapsed / args.iters * 1e3:.1f} ms/map",
            file=sys.stderr,
        )
    # guard against any runtime result caching making pipelined time unreal
    elapsed = max(elapsed, 0.5 * latency * args.iters)

    per_map = elapsed / (args.iters * args.batch)
    mpix_s = args.height * args.width / 1e6 / per_map

    if args.verbose:
        print(
            f"compile {compile_s:.1f}s; {per_map * 1e3:.1f} ms per "
            f"{args.width}x{args.height} depth map",
            file=sys.stderr,
        )
    return mpix_s


def _emit_side_metrics(args, model, variables, record):
    """Optional extra keys on the SAME JSON line (driver parse stays
    stable), each behind the wall-clock deadline guard: cold (empty
    .cache/jax) the whole bench measured 15+ min wall on this box — almost
    all of it tunnel-side XLA compiles — which risks the driver's own
    timeout killing the process before ANY metric prints. If the remaining
    budget looks too small, emit the primary line without the side keys
    instead of dying with nothing. Default chosen against measured tunnel
    variance: the forward section took 90 s and 505 s on two back-to-back
    runs of the same binary (tunnel-side compile queue); 780 s + the side
    sections stays under the 15-min envelope the round-3 driver
    demonstrably tolerated."""
    import copy

    deadline = float(os.environ.get("BENCH_DEADLINE_S", "780"))

    def over_deadline():
        return time.monotonic() - _PROCESS_START > deadline

    # Second geometry: Tanks & Temples eval class (1056x1920 N=7,
    # reference eval.sh:19-21) — wins on the primary DTU config that
    # regress wide-baseline geometries must show up here (VERDICT r4
    # item 6).
    if not args.no_tanks_metric:
        if over_deadline():
            record["tanks_skipped"] = "deadline"
        else:
            gargs = copy.copy(args)
            gargs.height, gargs.width, gargs.num_views = 1056, 1920, 7
            gargs.iters, gargs.warmup = 6, 1
            try:
                g_mpix = _bench_forward(gargs, model, variables)
                record["tanks_1056x1920_n7_mpix_s"] = round(g_mpix, 3)
            except Exception as exc:
                record["tanks_error"] = str(exc)[:200]

    if not args.no_train_metric and over_deadline():
        record["train_skipped"] = (
            f"deadline: {time.monotonic() - _PROCESS_START:.0f}s elapsed > "
            f"{deadline:.0f}s (cold compile; see bench notes in PROGRESS.md)"
        )
        args.no_train_metric = True
    if not args.no_train_metric:
        # driver-visible training throughput (VERDICT round-2 item 5)
        targs = copy.copy(args)
        targs.height, targs.width, targs.batch = 512, 640, 2
        targs.iters, targs.warmup = 4, 1
        try:
            samples_s = bench_train(targs, emit=False)
            record["train_samples_per_s"] = round(samples_s, 3)
            record["train_vs_round1"] = round(samples_s / 1.64, 3)
            record["train_precision"] = (
                "f32" if getattr(targs, "train_f32", False) else "bf16"
            )
        except Exception as exc:  # never break the primary metric
            record["train_error"] = str(exc)[:200]


if __name__ == "__main__":
    main()
