"""Bitonic sorting networks vs jnp.sort (used by propagation — reference
semantics: torch.sort in models/patchmatch.py:122)."""

import numpy as np
import jax.numpy as jnp
import pytest

from patchmatchnet_tpu.ops.sortnet import (
    bitonic_sort_axis1,
    merge_sorted_desc_with_unsorted,
)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 8, 9, 16, 24, 48])
def test_bitonic_sort_matches_jnp(n):
    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.standard_normal((2, n, 5, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(bitonic_sort_axis1(x)), np.sort(np.asarray(x), axis=1)
    )


@pytest.mark.parametrize("n_base,n_extra", [(8, 8), (16, 16), (48, 16), (1, 8), (8, 1)])
def test_merge_matches_full_sort(n_base, n_extra):
    rng = np.random.default_rng(n_base * 31 + n_extra)
    base = np.sort(rng.standard_normal((2, n_base, 4, 6)).astype(np.float32), axis=1)[:, ::-1]
    extra = rng.standard_normal((2, n_extra, 4, 6)).astype(np.float32)
    out = merge_sorted_desc_with_unsorted(jnp.asarray(base.copy()), jnp.asarray(extra))
    expect = np.sort(np.concatenate([base, extra], axis=1), axis=1)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_propagate_initializer_invariant():
    """Every depth initializer wired into `propagate` must yield samples
    DESCENDING along the hypothesis axis — the precondition of
    merge_sorted_desc_with_unsorted. A new initializer that breaks this
    fails here loudly instead of silently unsorting hypotheses."""
    from patchmatchnet_tpu.models.patchmatch import (
        init_perturbed_depth,
        init_random_depth,
        propagate,
    )

    rng = np.random.default_rng(7)
    b, h, w = 2, 8, 8
    dmin = jnp.asarray([2.0, 425.0])
    dmax = jnp.asarray([10.0, 935.0])

    noise = jnp.asarray(rng.random((b, 48, h, w)), jnp.float32)
    rand = init_random_depth(noise, dmin, dmax)
    assert bool(jnp.all(jnp.diff(rand, axis=1) <= 0)), "stage-3 init not descending"

    prev = jnp.asarray(rng.random((b, h, w)) * 6 + 3, jnp.float32)
    pert = init_perturbed_depth(prev, dmin, dmax, 16, 0.025)
    assert bool(jnp.all(jnp.diff(pert, axis=1) <= 0)), "perturbed init not descending"

    # and through propagate, the merge network must agree with jnp.sort
    import os

    grid_pts = jnp.asarray(rng.random((b, 8, h, w, 2)) * 2 - 1, jnp.float32)
    for sample in (rand, pert):
        merged = propagate(sample, grid_pts)
        os.environ["PATCHMATCHNET_TPU_SORT"] = "lax"
        try:
            lax_sorted = propagate(sample, grid_pts)
        finally:
            del os.environ["PATCHMATCHNET_TPU_SORT"]
        np.testing.assert_array_equal(np.asarray(merged), np.asarray(lax_sorted))


def test_merge_with_ties_and_clamped_values():
    # clipped inverse-depth perturbation produces runs of equal values
    base = np.repeat(np.linspace(10, 2, 8, dtype=np.float32), 2)[None, :, None, None]
    base = np.broadcast_to(base, (1, 16, 2, 2)).copy()
    extra = np.full((1, 8, 2, 2), 5.0, np.float32)
    out = merge_sorted_desc_with_unsorted(jnp.asarray(base), jnp.asarray(extra))
    expect = np.sort(np.concatenate([base, extra], axis=1), axis=1)
    np.testing.assert_array_equal(np.asarray(out), expect)
