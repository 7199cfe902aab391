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
    ):
        """bucket_multiple > 0 rounds (H, W) up to that multiple with
        edge-replicated padding and crops the outputs back, so datasets with
        heterogeneous image sizes (ETH3D multi-camera scans) hit a handful
        of compiled shapes instead of one compile per distinct size.
        Validity is exact for interior pixels up to border effects inside
        the pad margin (conv halo + sampling near the seam); 0 = exact
        shapes (reference-parity, one compile per distinct size)."""
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
        # per-stage fallback state: stage-set key -> jitted program, and a
        # sticky per-(padded H, W) choice so a geometry that escapes once
        # runs the demoted program DIRECTLY on subsequent batches (one run,
        # not run + re-run). Measured need: ETH3D portrait orientation
        # escapes ~2.6M stage-3 samples on EVERY batch (PROGRESS.md round 4).
        self._forwards: Dict[str, Any] = {}
        self._stage_override: Dict[Any, str] = {}
        self.escape_fallbacks = 0  # batches re-run on a demoted sampler set

    def _run(self, stages_key: Optional[str], args):
        """Run the forward with the windowed sampler restricted to
        `stages_key` (comma-joined stage ids; "" = pure gather; None = the
        ambient environment default). The sampler choice is read from the
        environment at TRACE time, and jax.jit traces once per input shape —
        so the override must wrap every call (a new shape arriving later
        would otherwise trace without it and silently pick the windowed
        sampler again)."""
        if stages_key is None:
            return self._forward(*args)
        fn = self._forwards.get(stages_key)
        if fn is None:
            # A fresh closure per stage set is REQUIRED, not style:
            # jax.jit's trace cache is keyed on the wrapped function
            # object, so jax.jit(self._forward_fn) would silently REUSE
            # the default program's trace (and its trace-time sampler
            # choice) instead of re-reading the environment. Verified
            # empirically — see test_per_stage_demotion_is_sticky.
            inner = self._forward_fn

            def run(*a, _inner=inner):
                return _inner(*a)

            fn = self._forwards[stages_key] = jax.jit(run)
        prev_s = os.environ.get("PATCHMATCHNET_TPU_SAMPLER")
        prev_w = os.environ.get("PATCHMATCHNET_TPU_WINDOWED_STAGES")
        if stages_key:
            os.environ["PATCHMATCHNET_TPU_WINDOWED_STAGES"] = stages_key
        else:
            os.environ["PATCHMATCHNET_TPU_SAMPLER"] = "gather"
        try:
            return fn(*args)
        finally:
            for k, prev in (
                ("PATCHMATCHNET_TPU_SAMPLER", prev_s),
                ("PATCHMATCHNET_TPU_WINDOWED_STAGES", prev_w),
            ):
                if prev is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = prev

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
        depth, confidence, escapes = self._run(stages_key, args)
        esc = np.asarray(escapes)
        while esc.sum() > 0:
            # The windowed sampler's locality bound was exceeded at the
            # escaping stage(s) (it would have zeroed `escapes` samples).
            # Demote ONLY those stages to the exact gather sampler and
            # re-run — correctness over speed — then remember the demotion
            # for this shape so later batches run the mixed program
            # directly. Stages that stay windowed remain guarded: if they
            # escape on a later batch the loop demotes them too, bottoming
            # out at pure gather (which cannot escape).
            import warnings

            active = self._active_stages(stages_key)
            escaped = {str(s + 1) for s in range(3) if esc[s] > 0}
            reduced = active - escaped
            if reduced == active:
                # escapes reported by a stage that is not windowed here —
                # demotion cannot help; keep the result (escaped samples
                # contribute zero) rather than loop forever
                warnings.warn(
                    f"escape counter fired ({int(esc.sum())}) outside the "
                    f"active windowed stage set {sorted(active)}; keeping "
                    "the current result"
                )
                break
            stages_key = ",".join(sorted(reduced))
            warnings.warn(
                f"windowed sampler escaped {int(esc.sum())} samples at "
                f"stage(s) {sorted(escaped)}; re-running with the windowed "
                f"sampler restricted to stage(s) "
                f"{sorted(reduced) or ['none — pure gather']} (sticky for "
                f"shape {shape_key}; consider PATCHMATCHNET_TPU_HBAND/_TW "
                "tuning for this dataset geometry)"
            )
            self.escape_fallbacks += 1
            self._stage_override[shape_key] = stages_key
            depth, confidence, escapes = self._run(stages_key, args)
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
            # exported artifacts predate the escape diagnostic: no fallback
            return (*out, jnp.zeros((3,), jnp.int32))

        self._forward = forward
        self._forwards = {}
        self._stage_override = {}
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
