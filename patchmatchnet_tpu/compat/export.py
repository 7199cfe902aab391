"""AOT export of the jitted inference function (StableHLO via jax.export).

The TPU-native analog of the reference's TorchScript module artifact
(reference: train.py:50-55): a serialized, self-contained compiled-function
artifact with the weights baked in, loadable without the model source.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def export_inference(
    variables: Dict[str, Any],
    batch: int,
    num_views: int,
    height: int,
    width: int,
    model: Optional[Any] = None,
) -> bytes:
    """Serialize the inference forward for a fixed input geometry.

    The exported function takes (images [B,N,H,W,3], intrinsics [B,N,3,3],
    extrinsics [B,N,4,4], depth_min [B], depth_max [B], noise [B,48,H/8,W/8])
    and returns (depth [B,H,W], confidence [B,H,W]).
    """
    from jax import export as jax_export

    from patchmatchnet_tpu.models import PatchmatchNet

    model = model or PatchmatchNet()
    # Exported artifacts are frozen programs: the runtime escape guard
    # (infer.DepthEstimator's per-stage sticky gather fallback) cannot run
    # around them, so a reduced-precision export would bake in the windowed
    # sampler with NO fallback — escaping geometries would silently zero
    # similarity terms. Only the f32 configuration (which always selects
    # the exact gather sampler, models/patchmatch.py:775-789) is exportable.
    dt = getattr(model, "compute_dtype", None)
    if dt is not None and jnp.dtype(dt).itemsize < 4:
        raise ValueError(
            "export_inference only supports full-precision (f32) models: "
            "reduced-precision models select the windowed sampler, whose "
            "runtime escape guard/fallback lives in infer.DepthEstimator "
            "and cannot be carried inside a frozen StableHLO artifact. "
            "Export with compute_dtype=None (the default) instead."
        )

    def fn(images, intrinsics, extrinsics, depth_min, depth_max, noise):
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

    args = (
        jax.ShapeDtypeStruct((batch, num_views, height, width, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, num_views, 3, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, num_views, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.float32),
        jax.ShapeDtypeStruct((batch, 48, height // 8, width // 8), jnp.float32),
    )
    exported = jax_export.export(jax.jit(fn))(*args)
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize an exported artifact; returns a callable
    (use `.call(*args)`)."""
    from jax import export as jax_export

    return jax_export.deserialize(blob)
