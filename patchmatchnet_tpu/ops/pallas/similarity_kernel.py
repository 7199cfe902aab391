"""Fused bilinear-combine + group-correlation Pallas kernel.

After the (XLA) quad gather produces the 2x2 taps for every warp sample,
three more passes over [P, C]-sized data remain: the bilinear weighted sum,
the multiply with broadcast reference features, and the group-mean matmul.
XLA materializes each (plus layout copies, see PROGRESS.md); this kernel does
all three in one VMEM-resident pipeline:

    similarity[p, g] = sum_c ((sum_t w4[p, t] * taps[p, t*C + c]) * ref[p mod HW, c]) * GM[c, g]

Layout: points p are ordered (d, hw) so each block stays within one depth
slice and the reference-feature block index is p mod HW.

Training: the kernel is wrapped in jax.custom_vjp with the pure-jnp
formulation as backward (inference-speed forward, straightforward training).
On CPU (tests) the kernel runs in interpreter mode. Set
PATCHMATCHNET_TPU_NO_PALLAS=1 to force the jnp path everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024  # bytes for the taps block


def _jnp_impl(taps, w4, ref, gm, num_depth):
    """Reference implementation: [B,P,4C],[B,P,4],[B,HW,C],[C,G] -> [B,P,G]."""
    b, p, c4 = taps.shape
    c = c4 // 4
    hw = ref.shape[1]
    warped = (
        taps[..., 0 * c : 1 * c] * w4[..., 0:1]
        + taps[..., 1 * c : 2 * c] * w4[..., 1:2]
        + taps[..., 2 * c : 3 * c] * w4[..., 2:3]
        + taps[..., 3 * c : 4 * c] * w4[..., 3:4]
    )
    prod = warped.reshape(b, num_depth, hw, c) * ref[:, None]
    sim = jnp.matmul(prod, gm, precision=jax.lax.Precision.HIGHEST)
    return sim.reshape(b, p, gm.shape[1])


def _rows_per_block(height: int, width: int, c4: int) -> int:
    """Largest divisor of `height` whose taps block fits the VMEM budget."""
    budget_rows = max(1, _VMEM_BUDGET // (width * c4 * 4))
    rows = min(height, budget_rows)
    while height % rows:
        rows -= 1
    return rows


def _kernel_squeeze(taps_ref, w4_ref, ref_ref, gm_ref, out_ref):
    # blocks carry a leading singleton batch dim
    taps = taps_ref[0]
    w4 = w4_ref[0]
    ref = ref_ref[0]
    c = ref.shape[-1]
    warped = (
        taps[:, 0 * c : 1 * c] * w4[:, 0:1]
        + taps[:, 1 * c : 2 * c] * w4[:, 1:2]
        + taps[:, 2 * c : 3 * c] * w4[:, 2:3]
        + taps[:, 3 * c : 4 * c] * w4[:, 3:4]
    )
    out_ref[0] = jnp.dot(
        warped * ref, gm_ref[:], preferred_element_type=jnp.float32
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def warped_group_similarity(taps, w4, ref, gm, num_depth, height, width):
    """Fused similarity: taps [B, P, 4C], w4 [B, P, 4], ref [B, HW, C],
    gm [C, G] -> [B, P, G], with P = num_depth * height * width ordered
    (d, h, w)."""
    if os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS"):
        return _jnp_impl(taps, w4, ref, gm, num_depth)
    return _pallas_wrapped(taps, w4, ref, gm, num_depth, height, width)


def _pallas_wrapped(taps, w4, ref, gm, num_depth, height, width):
    b, p, c4 = taps.shape
    c = ref.shape[-1]
    g = gm.shape[1]
    hw = height * width
    rpb = _rows_per_block(height, width, c4)
    tile = rpb * width
    grid = (b, num_depth, height // rpb)
    interpret = jax.default_backend() == "cpu"

    return pl.pallas_call(
        _kernel_squeeze,
        out_shape=jax.ShapeDtypeStruct((b, p, g), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile, c4),
                lambda bi, d, j: (bi, d * (hw // tile) + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, 4),
                lambda bi, d, j: (bi, d * (hw // tile) + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, c), lambda bi, d, j: (bi, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((c, g), lambda bi, d, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, g),
            lambda bi, d, j: (bi, d * (hw // tile) + j, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(taps, w4, ref, gm)


def _fwd(taps, w4, ref, gm, num_depth, height, width):
    out = warped_group_similarity(taps, w4, ref, gm, num_depth, height, width)
    return out, (taps, w4, ref, gm)


def _bwd(num_depth, height, width, residuals, grad_out):
    taps, w4, ref, gm = residuals
    _, vjp = jax.vjp(
        lambda t, w, r, m: _jnp_impl(t, w, r, m, num_depth), taps, w4, ref, gm
    )
    return vjp(grad_out)


warped_group_similarity.defvjp(_fwd, _bwd)
