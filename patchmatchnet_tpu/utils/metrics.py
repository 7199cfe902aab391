"""Depth-map quality metrics and a dict averaging meter.

Same definitions as the reference metrics (reference: utils.py:141-221):
per-image masked means, averaged over the batch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def _per_image_masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of `values` over mask per image, then mean over batch.

    values/mask: [B, H, W] (mask boolean or float).
    """
    m = mask.astype(values.dtype)
    batch = values.shape[0]
    num = jnp.sum(values.reshape(batch, -1) * m.reshape(batch, -1), axis=1)
    den = jnp.maximum(jnp.sum(m.reshape(batch, -1), axis=1), 1.0)
    return jnp.mean(num / den)


def absolute_depth_error(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Average absolute depth error over masked pixels (per image, then batch)."""
    return _per_image_masked_mean(jnp.abs(depth_est - depth_gt), mask)


def threshold_error(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Fraction of masked pixels whose absolute error exceeds `threshold`."""
    err = (jnp.abs(depth_est - depth_gt) > threshold).astype(jnp.float32)
    return _per_image_masked_mean(err, mask)


class DictAverageMeter:
    """Running mean of a dict of floats (reference: utils.py:141-169)."""

    def __init__(self) -> None:
        self.data: Dict[Any, float] = {}
        self.count = 0

    def update(self, new_input: Dict[Any, float]) -> None:
        self.count += 1
        for k, v in new_input.items():
            v = float(v)
            self.data[k] = self.data.get(k, 0.0) + v

    def mean(self) -> Dict[Any, float]:
        return {k: v / max(self.count, 1) for k, v in self.data.items()}
