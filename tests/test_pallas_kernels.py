"""Pallas kernel semantics vs the pure-jnp reference (interpret mode on CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# Off-TPU the public entry points route to the pure-jnp impl (dispatch in
# similarity_kernel._use_jnp — interpret-mode Pallas is too slow for the
# model-level CPU test tier). This module's whole purpose is the kernel
# semantics, so force the Pallas (interpret) path for its tests only.
@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setenv("PATCHMATCHNET_TPU_INTERPRET", "1")

from patchmatchnet_tpu.ops.pallas.similarity_kernel import (
    _jnp_impl,
    _tile_rows,
    warped_group_similarity,
)


@pytest.mark.parametrize("b,d,h,w,c,g", [(1, 4, 8, 16, 16, 4), (2, 3, 8, 32, 32, 8)])
def test_similarity_kernel_matches_jnp(b, d, h, w, c, g):
    # h*w multiples of 128 exercise the Pallas path (interpret mode on CPU)
    rng = np.random.default_rng(0)
    p = d * h * w
    taps = jnp.asarray(rng.standard_normal((b, p, 4 * c)), jnp.float32)
    w4 = jnp.asarray(rng.random((b, 4, p)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, h * w, c)), jnp.float32)
    gm = np.zeros((c, g), np.float32)
    cg = c // g
    for gi in range(g):
        gm[gi * cg : (gi + 1) * cg, gi] = 1.0 / cg
    gm = jnp.asarray(gm)

    out = warped_group_similarity(taps, w4, ref, gm, d)
    assert out.shape == (b, g, p)
    expected = _jnp_impl(taps, w4, ref, gm, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_similarity_kernel_gradients():
    """custom_vjp backward must equal the jnp-path gradients."""
    rng = np.random.default_rng(1)
    b, d, h, w, c, g = 1, 2, 4, 6, 8, 4
    p = d * h * w
    taps = jnp.asarray(rng.standard_normal((b, p, 4 * c)), jnp.float32)
    w4 = jnp.asarray(rng.random((b, 4, p)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, h * w, c)), jnp.float32)
    gm = jnp.asarray(np.ones((c, g), np.float32) / (c // g))

    def loss_kernel(t, wq, r):
        return warped_group_similarity(t, wq, r, gm, d).sum()

    def loss_jnp(t, wq, r):
        return _jnp_impl(t, wq, r, gm, d).sum()

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(taps, w4, ref)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(taps, w4, ref)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)


@pytest.mark.parametrize("b,d,h,w,c,g", [(1, 3, 8, 16, 16, 4), (2, 2, 8, 32, 8, 4)])
def test_similarity_kernel_pallas_backward(b, d, h, w, c, g):
    """The fused Pallas backward (interpret mode on CPU) must match the
    jnp-path VJP, with a non-uniform cotangent."""
    rng = np.random.default_rng(2)
    p = d * h * w
    taps = jnp.asarray(rng.standard_normal((b, p, 4 * c)), jnp.float32)
    w4 = jnp.asarray(rng.random((b, 4, p)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, h * w, c)), jnp.float32)
    gm = np.zeros((c, g), np.float32)
    cg = c // g
    for gi in range(g):
        gm[gi * cg : (gi + 1) * cg, gi] = 1.0 / cg
    gm = jnp.asarray(gm)
    cot = jnp.asarray(rng.standard_normal((b, g, p)), jnp.float32)

    def run(t, wq, r):
        return jnp.vdot(warped_group_similarity(t, wq, r, gm, d), cot)

    def run_jnp(t, wq, r):
        return jnp.vdot(_jnp_impl(t, wq, r, gm, d), cot)

    g1 = jax.grad(run, argnums=(0, 1, 2))(taps, w4, ref)  # Pallas bwd (hw%128==0)
    g2 = jax.grad(run_jnp, argnums=(0, 1, 2))(taps, w4, ref)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-5)


def test_tile_rows_divides():
    for hw in (128, 15616, 62336, 248832 // 128 * 128 + 128):
        for esize in (2, 4):
            t = _tile_rows(hw, 256, 64, esize)
            assert hw % t == 0
            assert t % 128 == 0
