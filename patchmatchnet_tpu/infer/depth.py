"""Depth/confidence map export (the reference's save_depth — eval.py:20-82).

Wraps the jitted PatchmatchNet forward with host-side pre/post-processing:
multiple-of-8 dim adjustment before the graph, resize back to the original
resolution after (bilinear for depth, nearest for confidence — matching
reference net.py:282-283, 298-299).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from patchmatchnet_tpu.dataio import save_map
from patchmatchnet_tpu.dataio.image import resize_bilinear_np
from patchmatchnet_tpu.models import PatchmatchNet


def _resize_nearest_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest resize matching torch F.interpolate(mode='nearest')."""
    in_h, in_w = img.shape[:2]
    if (in_h, in_w) == (out_h, out_w):
        return img
    ys = (np.arange(out_h) * in_h // out_h).clip(0, in_h - 1)
    xs = (np.arange(out_w) * in_w // out_w).clip(0, in_w - 1)
    return img[ys][:, xs]


class DepthEstimator:
    """Jitted PatchmatchNet inference with per-shape compile caching.

    With `mesh` (a 1-D data mesh from parallel.make_mesh), batches are
    sharded over the data axis — each chip processes whole reference views
    with replicated params, mirroring the reference's DataParallel
    inference (eval.py:33-42). batch_size must be a multiple of the mesh
    size."""

    def __init__(
        self,
        variables: Dict[str, Any],
        model: Optional[PatchmatchNet] = None,
        mesh=None,
        bucket_multiple: int = 0,
        derive_windows: bool = True,
    ):
        """bucket_multiple > 0 rounds (H, W) up to that multiple with
        edge-replicated padding and crops the outputs back, so datasets with
        heterogeneous image sizes (ETH3D multi-camera scans) hit a handful
        of compiled shapes instead of one compile per distinct size.
        Validity is exact for interior pixels up to border effects inside
        the pad margin (conv halo + sampling near the seam); 0 = exact
        shapes (reference-parity, one compile per distinct size).

        derive_windows=True (default) derives the windowed sampler's
        per-stage (tile width, band height) from the first batch's
        projection geometry (ops/pallas/window_bounds.derive_batch_windows)
        instead of the measured-envelope defaults: geometries whose
        epipolar tilt overflows the default band (e.g. ETH3D portrait
        orientations) run windowed at a derived sound band rather than
        demoting to the gather sampler, and geometries with less tilt than
        the envelope get a cheaper kernel (fewer one-hot MACs). Stages the
        derivation proves unsound at any candidate window start on the
        gather sampler directly (no escape round trip). The in-graph
        escape counter stays on as the runtime backstop: an escape
        re-derives from the escaping batch once, then demotes."""
        if bucket_multiple and bucket_multiple % 8 != 0:
            raise ValueError("bucket_multiple must be a multiple of 8")
        self.bucket_multiple = bucket_multiple
        self.model = model or PatchmatchNet()
        self.variables = variables
        self.mesh = mesh
        if mesh is not None:
            from patchmatchnet_tpu.parallel import replicated_sharding

            self.variables = jax.device_put(variables, replicated_sharding(mesh))

        def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
            (depth, confidence, _), diag = self.model.apply(
                self.variables,
                images,
                intrinsics,
                extrinsics,
                depth_min,
                depth_max,
                train=False,
                init_noise=noise,
                mutable=["diagnostics"],
            )
            # per-stage windowed-sampler escapes this forward, [stage1..3]
            # (all zero when the windowed path is exact or not in use —
            # see patchmatch.py). Per-stage resolution lets the fallback
            # demote ONLY the escaping stage to the gather sampler.
            d = diag.get("diagnostics", {})
            escapes = jnp.stack(
                [
                    sum(
                        jax.tree.leaves(d.get(f"patchmatch_{s}", {})),
                        jnp.zeros((), jnp.int32),
                    )
                    for s in (1, 2, 3)
                ]
            )
            return depth, confidence, escapes

        self._forward_fn = forward
        self._forward = jax.jit(forward)
        # per-stage fallback state: (stage-set, windows) key -> jitted
        # program, and a sticky per-(padded H, W) choice so a geometry that
        # escapes once runs the demoted/retuned program DIRECTLY on
        # subsequent batches (one run, not run + re-run). Measured need:
        # ETH3D portrait orientation escapes ~2.6M stage-3 samples on EVERY
        # batch at the envelope band (PROGRESS.md round 4).
        self._forwards: Dict[Any, Any] = {}
        self._stage_override: Dict[Any, str] = {}
        self._derive_windows = derive_windows
        # per-shape derived windows: shape_key -> tuple of (stage, tw, hband)
        self._windows: Dict[Any, tuple] = {}
        self._retunes: Dict[Any, int] = {}  # (shape_key, stage) -> count
        self.escape_fallbacks = 0  # batches re-run on a demoted sampler set

    def _run(self, stages_key: Optional[str], windows: Optional[tuple], args):
        """Run the forward with the windowed sampler restricted to
        `stages_key` (comma-joined stage ids; "" = pure gather; None = the
        ambient environment default) and per-stage derived windows
        `windows` (tuple of (stage, tw, hband); None/absent stage = the
        envelope default). The sampler choice is read from the environment
        at TRACE time, and jax.jit traces once per input shape — so the
        override must wrap every call (a new shape arriving later would
        otherwise trace without it and silently pick the windowed sampler
        again)."""
        if stages_key is None and not windows:
            return self._forward(*args)
        key = (stages_key, windows)
        fn = self._forwards.get(key)
        if fn is None:
            # A fresh closure per (stage set, windows) is REQUIRED, not
            # style: jax.jit's trace cache is keyed on the wrapped function
            # object, so jax.jit(self._forward_fn) would silently REUSE
            # the default program's trace (and its trace-time sampler
            # choice) instead of re-reading the environment. Verified
            # empirically — see test_per_stage_demotion_is_sticky.
            inner = self._forward_fn

            def run(*a, _inner=inner):
                return _inner(*a)

            fn = self._forwards[key] = jax.jit(run)
        keys = ("PATCHMATCHNET_TPU_SAMPLER", "PATCHMATCHNET_TPU_WINDOWED_STAGES")
        keys += tuple(f"PATCHMATCHNET_TPU_WIN_S{s}" for s, _, _ in windows or ())
        prev = {k: os.environ.get(k) for k in keys}
        if stages_key is not None:
            if stages_key:
                os.environ["PATCHMATCHNET_TPU_WINDOWED_STAGES"] = stages_key
            else:
                os.environ["PATCHMATCHNET_TPU_SAMPLER"] = "gather"
        for s, tw, hband in windows or ():
            os.environ[f"PATCHMATCHNET_TPU_WIN_S{s}"] = f"{tw},{hband}"
        try:
            return fn(*args)
        finally:
            for k, v in prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def _windowed_active(self) -> bool:
        """Whether this model/environment selects the windowed sampler at
        all (mirrors the trace-time test in models/patchmatch.py): f32
        models use the exact gather sampler — nothing to derive."""
        dt = getattr(self.model, "compute_dtype", None)
        return (
            dt is not None
            and jnp.dtype(dt).itemsize < 4
            and os.environ.get("PATCHMATCHNET_TPU_SAMPLER", "windowed")
            == "windowed"
        )

    def _derive_spec(self, batch: Dict[str, Any], h: int, w: int) -> dict:
        """Raw per-stage derivation from this batch's projections:
        {stage: (tw, hband) or None}."""
        from patchmatchnet_tpu.ops.pallas.window_bounds import (
            derive_batch_windows,
        )

        return derive_batch_windows(
            np.asarray(batch["intrinsics"]),
            np.asarray(batch["extrinsics"]),
            np.asarray(batch["depth_min"]),
            np.asarray(batch["depth_max"]),
            h,
            w,
        )

    def _active_stages(self, stages_key: Optional[str]) -> frozenset:
        """Stage ids the windowed sampler is currently allowed on."""
        if stages_key is None:
            if os.environ.get("PATCHMATCHNET_TPU_SAMPLER", "windowed") != "windowed":
                return frozenset()
            stages_key = os.environ.get("PATCHMATCHNET_TPU_WINDOWED_STAGES", "1,2,3")
        return frozenset(s for s in stages_key.split(",") if s)

    def __call__(self, batch: Dict[str, Any], rng: jax.Array):
        """batch: adjusted sample batch (see data.adjust_sample_dims).
        Returns (depth [B, Ho, Wo], confidence [B, Ho, Wo]) at the ORIGINAL
        resolution as numpy arrays."""
        images = np.asarray(batch["images"])
        b, _, h0, w0 = images.shape[:4]
        crop_hw = None
        if self.bucket_multiple:
            m = self.bucket_multiple
            hb, wb = -(-h0 // m) * m, -(-w0 // m) * m
            if (hb, wb) != (h0, w0):
                # edge-replicate padding minimizes feature artifacts at the
                # seam; outputs are cropped back below
                images = np.pad(
                    images,
                    ((0, 0), (0, 0), (0, hb - h0), (0, wb - w0), (0, 0)),
                    mode="edge",
                )
                crop_hw = (h0, w0)
        images = jnp.asarray(images)
        b, _, h, w = images.shape[:4]
        noise = jax.random.uniform(rng, (b, 48, h // 8, w // 8), jnp.float32)
        args = (
            images,
            jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["depth_min"]),
            jnp.asarray(batch["depth_max"]),
            noise,
        )
        if self.mesh is not None:
            from patchmatchnet_tpu.parallel import shard_batch

            args = shard_batch(args, self.mesh)
        shape_key = (h, w)
        stages_key = self._stage_override.get(shape_key)
        windows = self._windows.get(shape_key)
        if (
            shape_key not in self._windows
            and self._derive_windows
            and self._windowed_active()
        ):
            # First batch at this shape: derive the per-stage windows from
            # its projection geometry. Stages with no sound window at any
            # candidate start demoted (no escape round trip); soundness for
            # LATER batches with different cameras is not guaranteed by
            # this derivation — the escape backstop below re-derives once.
            spec = self._derive_spec(batch, h, w)
            windows = tuple(
                sorted((s, v[0], v[1]) for s, v in spec.items() if v)
            )
            unsound = {str(s) for s, v in spec.items() if v is None}
            self._windows[shape_key] = windows
            if unsound and stages_key is None:
                stages_key = ",".join(
                    sorted(self._active_stages(None) - unsound)
                )
                self._stage_override[shape_key] = stages_key
        depth, confidence, escapes = self._run(stages_key, windows, args)
        esc = np.asarray(escapes)
        rounds = 0
        while esc.sum() > 0:
            # The windowed sampler's locality bound was exceeded at the
            # escaping stage(s) (it would have zeroed `escapes` samples).
            # Re-derive the window for those stages from THIS batch once
            # (correctness over speed); if a retuned stage escapes again —
            # or the derivation has no better answer — demote it to the
            # exact gather sampler. The choice is sticky per shape so later
            # batches run the retuned/demoted program directly. Stages that
            # stay windowed remain guarded, bottoming out at pure gather
            # (which cannot escape).
            import warnings

            rounds += 1
            active = self._active_stages(stages_key)
            escaped = {str(s + 1) for s in range(3) if esc[s] > 0}
            bad = sorted(escaped & active)
            if not bad or rounds > 4:
                # escapes reported by a stage that is not windowed here
                # (demotion cannot help; escaped samples contribute zero),
                # or the retune loop failed to converge — keep the result
                warnings.warn(
                    f"escape counter fired ({int(esc.sum())}) at stage(s) "
                    f"{sorted(escaped)} with windowed set {sorted(active)} "
                    f"after {rounds - 1} fallback round(s); keeping the "
                    "current result"
                )
                break
            wmap = {s: (tw, hb) for s, tw, hb in (windows or ())}
            demoted = set()
            if self._derive_windows:
                spec = self._derive_spec(batch, h, w)
                for s in bad:
                    si = int(s)
                    new = spec.get(si)
                    if (
                        new is None
                        or new == wmap.get(si)
                        or self._retunes.get((shape_key, si), 0) >= 1
                    ):
                        demoted.add(s)
                    else:
                        self._retunes[(shape_key, si)] = (
                            self._retunes.get((shape_key, si), 0) + 1
                        )
                        wmap[si] = new
            else:
                demoted = set(bad)
            if demoted:
                stages_key = ",".join(sorted(active - demoted))
                self._stage_override[shape_key] = stages_key
                for s in demoted:
                    wmap.pop(int(s), None)
            windows = tuple(
                sorted((s, tw, hb) for s, (tw, hb) in wmap.items())
            )
            self._windows[shape_key] = windows
            warnings.warn(
                f"windowed sampler escaped {int(esc.sum())} samples at "
                f"stage(s) {bad}; "
                + (
                    f"demoting stage(s) {sorted(demoted)} to the gather "
                    "sampler"
                    if demoted
                    else f"retuned windows to {windows}"
                )
                + f" (sticky for shape {shape_key})"
            )
            self.escape_fallbacks += 1
            depth, confidence, escapes = self._run(stages_key, windows, args)
            esc = np.asarray(escapes)
        depth = np.asarray(depth)
        confidence = np.asarray(confidence)
        if crop_hw is not None:
            depth = depth[:, : crop_hw[0], : crop_hw[1]]
            confidence = confidence[:, : crop_hw[0], : crop_hw[1]]
            h, w = crop_hw

        orig_h = int(np.asarray(batch.get("orig_height", h)).reshape(-1)[0])
        orig_w = int(np.asarray(batch.get("orig_width", w)).reshape(-1)[0])
        if (orig_h, orig_w) != (h, w):
            depth = np.stack(
                [resize_bilinear_np(d, orig_h, orig_w) for d in depth]
            )
            confidence = np.stack(
                [_resize_nearest_np(c, orig_h, orig_w) for c in confidence]
            )
        return depth, confidence


class ModuleEstimator(DepthEstimator):
    """Inference from an exported StableHLO artifact (the analog of the
    reference's `--input_type module` TorchScript path, eval.py:22-39,37-39).

    The artifact bakes in weights and a FIXED input geometry; batches must
    match its (B, N, H, W) exactly (use --image_max_dim / batch_size to
    reproduce the export geometry)."""

    def __init__(self, blob: bytes):
        from patchmatchnet_tpu.compat import load_exported

        self.mesh = None  # fixed-geometry artifact; single-device execution
        self.bucket_multiple = 0  # shapes are baked into the artifact
        self._exported = load_exported(blob)
        self._shape = tuple(self._exported.in_avals[0].shape)

        def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
            if tuple(images.shape) != self._shape:
                raise ValueError(
                    f"exported module expects images {self._shape}, got "
                    f"{tuple(images.shape)}; re-export for this geometry or "
                    "set --image_max_dim/--batch_size to match"
                )
            out = self._exported.call(
                images, intrinsics, extrinsics, depth_min, depth_max, noise
            )
            # Exported artifacts are f32/gather-sampler only (enforced at
            # export time, compat/export.py): the gather sampler cannot
            # escape, so a zero escape vector is exact, not a bypass.
            return (*out, jnp.zeros((3,), jnp.int32))

        self._forward = forward
        self._forwards = {}
        self._stage_override = {}
        self._derive_windows = False  # sampler baked into the artifact
        self._windows = {}
        self._retunes = {}
        self.escape_fallbacks = 0


def save_depth_maps(
    estimator: DepthEstimator,
    loader: Iterable[Dict[str, Any]],
    output_folder: str,
    file_format: str = ".pfm",
    seed: int = 0,
    verbose: bool = True,
) -> int:
    """Run inference over a loader and write depth_est/ + confidence/ maps.

    Returns the number of maps written. Output naming matches the reference
    ("{scan}/depth_est/{view:08d}.pfm" etc. — reference: eval.py:74-82).
    """
    rng = jax.random.PRNGKey(seed)
    count = 0
    for batch_idx, batch in enumerate(loader):
        start = time.time()
        rng, key = jax.random.split(rng)
        depth, confidence = estimator(batch, key)
        for filename, d, c in zip(batch["filename"], depth, confidence):
            depth_path = os.path.join(output_folder, filename.format("depth_est", file_format))
            conf_path = os.path.join(output_folder, filename.format("confidence", file_format))
            os.makedirs(os.path.dirname(depth_path), exist_ok=True)
            os.makedirs(os.path.dirname(conf_path), exist_ok=True)
            save_map(depth_path, d.astype(np.float32))
            save_map(conf_path, c.astype(np.float32))
            count += 1
        if verbose:
            print(f"Batch {batch_idx + 1}, time = {time.time() - start:.3f}s")
    return count
