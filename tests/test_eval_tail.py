"""Fused eval-grid tail v2 (ops/pallas/eval_tail.py) vs the unfused
eval-grid aggregation (reference semantics anchor:
/root/reference/models/patchmatch.py:569-575 cost sampling, 627-669 depth
weight, 655-661 aggregation).

The fused path quantizes x_norm to 16-bit fixed point (error 2^-17) and
carries cost as bf16, so the cross-path comparison tolerance reflects
those bounds. On TPU the Pallas kernel must agree with the jnp oracle to
float-association tolerance (they share inputs bit-exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchmatchnet_tpu.ops.grid_sample import grid_sample_2d
from patchmatchnet_tpu.ops.pallas.eval_tail import eval_grid_score
from patchmatchnet_tpu.ops.pallas.windowed_similarity import on_tpu


def _unfused_score(x_norm_img, cost_img, grid, feature_weight, interval_scale):
    """The model's unfused eval-grid path (patchmatch.py), f32 throughout."""
    d = x_norm_img.shape[-1]
    joint = jnp.concatenate([x_norm_img, cost_img], axis=-1)
    sampled = grid_sample_2d(joint, grid, align_corners=False, padding_mode="border")
    x_smp = sampled[..., :d]
    cost_smp = sampled[..., d:]
    diff = jnp.abs(x_smp - x_norm_img[:, None]) / interval_scale
    dw = jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(diff, 0.0, 4.0))
    weight = dw * feature_weight[..., None]
    weight = weight / jnp.sum(weight, axis=1, keepdims=True)
    return jnp.sum(cost_smp * weight, axis=1)


def _inputs(d, ke, h, w, b=1, seed=7):
    rng = np.random.default_rng(seed)
    x_norm = rng.random((b, h, w, d)).astype(np.float32)
    cost = (rng.random((b, h, w, d)).astype(np.float32) - 0.5) * 4.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = xx[None, None] + rng.normal(0, 2.0, (b, ke, h, w))
    gy = yy[None, None] + rng.normal(0, 2.0, (b, ke, h, w))
    grid = np.stack(
        [(2 * gx + 1) / w - 1, (2 * gy + 1) / h - 1], axis=-1
    ).astype(np.float32)
    fw = rng.random((b, ke, h, w)).astype(np.float32) * 0.9 + 0.1
    return (
        jnp.asarray(x_norm), jnp.asarray(cost), jnp.asarray(grid),
        jnp.asarray(fw),
    )


@pytest.mark.parametrize(
    "d,ke,h,w",
    [(8, 9, 16, 48), (16, 9, 24, 32), (32, 9, 16, 16), (64, 9, 8, 16)],
)
def test_eval_tail_matches_unfused(d, ke, h, w):
    x_norm, cost, grid, fw = _inputs(d, ke, h, w)
    got = eval_grid_score(x_norm, cost, grid, fw, 0.025)
    want = _unfused_score(x_norm, cost, grid, fw, 0.025)
    # bf16 cost storage bounds the error: ~2^-8 relative on cost magnitude,
    # plus the 2^-17 x_norm quantization amplified 40x by 1/interval_scale
    # through the sigmoid.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)
    assert np.isfinite(np.asarray(got)).all()


@pytest.mark.parametrize("d", [8, 16, 32, 64])
@pytest.mark.skipif(not on_tpu(), reason="Pallas kernel needs a TPU backend")
def test_eval_tail_pallas_matches_oracle(d):
    """Kernel vs jnp oracle on identical (already-quantized) inputs: the
    only differences are float association (roll-tree vs linear sums), so
    agreement must be at ulp scale."""
    import os

    h, w, ke = 24, 48, 9
    x_norm, cost, grid, fw = _inputs(d, ke, h, w, seed=11)
    got = np.asarray(eval_grid_score(x_norm, cost, grid, fw, 0.025))
    os.environ["PATCHMATCHNET_TPU_NO_PALLAS"] = "1"
    try:
        want = np.asarray(eval_grid_score(x_norm, cost, grid, fw, 0.025))
    finally:
        del os.environ["PATCHMATCHNET_TPU_NO_PALLAS"]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
