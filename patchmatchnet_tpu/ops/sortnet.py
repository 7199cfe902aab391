"""Vectorized sorting networks for small static axes.

XLA lowers jnp.sort on TPU to a serial `while` loop (~7 ms/forward in the
propagation step at the DTU eval config). The hypothesis axis is tiny and
static (8..64), so a bitonic network of elementwise min/max stages — which
XLA fuses — replaces it.

`propagate` (reference: models/patchmatch.py:104-124) concatenates the
current hypotheses (monotone in inverse depth by construction of both
initializers, i.e. DESCENDING in depth) with Kp propagated samples and
sorts ascending. That factorizes as: bitonic-sort the Kp samples, then one
bitonic merge of (prop ascending | +inf padding | base descending) — a
bitonic sequence.
"""

from __future__ import annotations

import jax.numpy as jnp

_INF = jnp.inf


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def bitonic_merge_axis1(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending bitonic merge along axis 1 (length must be a power of 2,
    values along axis 1 must form a bitonic sequence)."""
    b, m = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    stride = m // 2
    while stride >= 1:
        y = x.reshape((b, m // (2 * stride), 2, stride) + rest)
        lo = jnp.minimum(y[:, :, 0], y[:, :, 1])
        hi = jnp.maximum(y[:, :, 0], y[:, :, 1])
        x = jnp.stack([lo, hi], axis=2).reshape((b, m) + rest)
        stride //= 2
    return x


def bitonic_sort_axis1(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending bitonic sort along axis 1 (any static length; +inf padded)."""
    b, n = x.shape[0], x.shape[1]
    rest = x.shape[2:]
    m = _next_pow2(n)
    if m != n:
        pad = jnp.full((b, m - n) + rest, _INF, x.dtype)
        x = jnp.concatenate([x, pad], axis=1)
    size = 2
    while size <= m:
        # flip substage: within each size-block, compare j with size-1-j
        y = x.reshape((b, m // size, size) + rest)
        first, second = y[:, :, : size // 2], y[:, :, size // 2 :][:, :, ::-1]
        lo = jnp.minimum(first, second)
        hi = jnp.maximum(first, second)
        x = jnp.concatenate([lo, hi[:, :, ::-1]], axis=2).reshape((b, m) + rest)
        # standard substages: stride size//4 .. 1
        stride = size // 4
        while stride and stride >= 1:
            y = x.reshape((b, m // (2 * stride), 2, stride) + rest)
            lo = jnp.minimum(y[:, :, 0], y[:, :, 1])
            hi = jnp.maximum(y[:, :, 0], y[:, :, 1])
            x = jnp.stack([lo, hi], axis=2).reshape((b, m) + rest)
            stride //= 2
        size *= 2
    return x[:, :n] if m != n else x


def merge_sorted_desc_with_unsorted(base_desc: jnp.ndarray, extra: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort of concat([base_desc, extra], axis=1) where base_desc
    is descending along axis 1: sort `extra` ascending, then one bitonic
    merge of (extra_asc | +inf pad | base_desc).

    PRECONDITION: `base_desc` MUST be non-increasing along axis 1, or the
    result is silently unsorted (a bitonic merge only sorts bitonic input).
    Both depth initializers satisfy this by construction — they are monotone
    increasing in inverse depth, hence descending in depth
    (models/patchmatch.py init_random_depth / init_perturbed_depth); a new
    initializer must preserve it or `propagate` must switch to
    PATCHMATCHNET_TPU_SORT=lax. NaN inputs also order differently than
    jnp.sort (min/max propagate NaN instead of sorting it last).
    tests/test_sortnet.py::test_propagate_initializer_invariant guards the
    invariant for every initializer wired into propagate."""
    b, n_base = base_desc.shape[0], base_desc.shape[1]
    n_extra = extra.shape[1]
    rest = base_desc.shape[2:]
    n = n_base + n_extra
    m = _next_pow2(n)
    extra_asc = bitonic_sort_axis1(extra)
    parts = [extra_asc]
    if m != n:
        parts.append(jnp.full((b, m - n) + rest, _INF, base_desc.dtype))
    parts.append(base_desc)
    merged = bitonic_merge_axis1(jnp.concatenate(parts, axis=1))
    return merged[:, :n] if m != n else merged
