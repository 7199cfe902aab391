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
    """Jitted PatchmatchNet inference with per-shape compile caching."""

    def __init__(self, variables: Dict[str, Any], model: Optional[PatchmatchNet] = None):
        self.model = model or PatchmatchNet()
        self.variables = variables

        def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
            depth, confidence, _ = self.model.apply(
                self.variables,
                images,
                intrinsics,
                extrinsics,
                depth_min,
                depth_max,
                train=False,
                init_noise=noise,
            )
            return depth, confidence

        self._forward = jax.jit(forward)

    def __call__(self, batch: Dict[str, Any], rng: jax.Array):
        """batch: adjusted sample batch (see data.adjust_sample_dims).
        Returns (depth [B, Ho, Wo], confidence [B, Ho, Wo]) at the ORIGINAL
        resolution as numpy arrays."""
        images = jnp.asarray(batch["images"])
        b, _, h, w = images.shape[:4]
        noise = jax.random.uniform(rng, (b, 48, h // 8, w // 8), jnp.float32)
        depth, confidence = self._forward(
            images,
            jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["depth_min"]),
            jnp.asarray(batch["depth_max"]),
            noise,
        )
        depth = np.asarray(depth)
        confidence = np.asarray(confidence)

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
