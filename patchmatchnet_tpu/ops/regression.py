"""Soft-argmin depth regression (reference: models/module.py:184-196)."""

from __future__ import annotations

import jax.numpy as jnp


def depth_regression(p: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Expectation of depth hypotheses under a probability volume.

    Args:
        p: probability volume [B, H, W, D] (hypothesis-last layout).
        depth_values: [B, D] (or [D]) discrete depth values.
    Returns:
        [B, H, W] expected depth.
    """
    if depth_values.ndim == 1:
        depth_values = depth_values[None]
    return jnp.sum(p * depth_values[:, None, None, :], axis=-1)
