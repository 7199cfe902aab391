"""Fused bilinear-combine + group-correlation Pallas kernel.

After the (XLA) quad gather produces the 2x2 taps for every warp sample,
three more passes over [P, C]-sized data remain: the bilinear weighted sum,
the multiply with broadcast reference features, and the group-mean matmul.
XLA materializes each (plus layout copies, see PROGRESS.md); this kernel does
all three in one VMEM-resident pipeline:

    sim[g, p] = sum_c GM[c, g] * ref[p mod HW, c] * sum_t w4[p, t] * taps[p, t*C + c]

The output is CHANNEL-FIRST [B, G, P]: G = 4..8 as a minor dim would force a
16x-padded T(8,128) HBM layout; with P minor the volume tiles densely and
downstream modules consume [B, G, D, H, W] directly.

Points p are ordered (d, hw) so each grid block stays within one depth slice
and the reference-feature block index is p mod HW.

Training: wrapped in jax.custom_vjp with the pure-jnp formulation as
backward (inference-speed forward, straightforward training). On CPU
(tests) the kernel runs in interpreter mode. Set
PATCHMATCHNET_TPU_NO_PALLAS=1 to force the jnp path everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024  # total VMEM target incl. double buffering


def _jnp_impl(taps, w4, ref, gm, num_depth):
    """Reference implementation: [B,P,4C],[B,4,P],[B,HW,C],[C,G] -> [B,G,P] f32.
    P must equal num_depth * ref.shape[1]. taps/ref may be bf16 (storage);
    all arithmetic runs in f32."""
    b, p, c4 = taps.shape
    c = c4 // 4
    hw = ref.shape[1]
    taps = taps.astype(jnp.float32)
    w4 = w4.astype(jnp.float32)
    warped = (
        taps[..., 0 * c : 1 * c] * w4[:, 0, :, None]
        + taps[..., 1 * c : 2 * c] * w4[:, 1, :, None]
        + taps[..., 2 * c : 3 * c] * w4[:, 2, :, None]
        + taps[..., 3 * c : 4 * c] * w4[:, 3, :, None]
    )
    prod = warped.reshape(b, num_depth, hw, c) * ref[:, None].astype(jnp.float32)
    return jnp.einsum(
        "bdpc,cg->bgdp",
        prod,
        gm.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(b, gm.shape[1], p)


# Depth slices are padded to multiples of this so every grid block is a
# full-sized tile. Small tiles are poison here: the divisor-of-hwp logic
# used in round 1 picked 256-point tiles at stage 3 (hwp=15616=2*61*128),
# turning the kernel into ~4k tiny grid steps; measured step overhead is
# ~2us, so tiles want to be as large as the VMEM budget allows.
SLICE_PAD = 2048


def _tile_rows(hwp: int, c4: int, c: int, esize: int) -> int:
    """Tile size in points: SLICE_PAD when it fits the double-buffered VMEM
    budget (it always does for this model's shapes), else the largest
    128-multiple divisor of hwp that fits."""
    c4_pad = max(c4, 128)
    c_pad = max(c, 128)
    # bytes per point-row in VMEM: taps + ref (payload dtype), w4 (f32,
    # 4 -> 128 lanes) + f32 out, double-buffered
    row_bytes = ((c4_pad + c_pad) * esize + (128 + 8) * 4) * 2
    budget = max(1, _VMEM_BUDGET // row_bytes // 128)
    if hwp % SLICE_PAD == 0 and budget >= SLICE_PAD // 128:
        return SLICE_PAD
    m = hwp // 128
    k = min(m, budget)
    while m % k:
        k -= 1
    return 128 * k


def _kernel(taps_ref, w4_ref, ref_ref, gm_ref, out_ref):
    # Payload refs (taps/ref) may be bf16 storage; every arithmetic op here
    # is f32 (bilinear weights carry sub-pixel depth signal).
    taps = taps_ref[0].astype(jnp.float32)  # [T, 4C]
    # w4 arrives transposed [4, T] so its VMEM block is lane-dense (a
    # [T, 4] block would pad 4 -> 128 lanes and double input traffic).
    w4 = jnp.transpose(w4_ref[0])  # [T, 4]
    ref = ref_ref[0].astype(jnp.float32)  # [T, C]
    c = ref.shape[-1]
    warped = (
        taps[:, 0 * c : 1 * c] * w4[:, 0:1]
        + taps[:, 1 * c : 2 * c] * w4[:, 1:2]
        + taps[:, 2 * c : 3 * c] * w4[:, 2:3]
        + taps[:, 3 * c : 4 * c] * w4[:, 3:4]
    )
    prod = warped * ref  # [T, C]
    # [G, T] = GM^T [G, C] x prod^T [C, T]
    out_ref[0] = jax.lax.dot_general(
        gm_ref[:],
        prod,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pallas_impl(taps, w4, ref, gm, num_depth):
    """Inputs must already have every depth slice padded to a multiple of
    128 points (see warp_taps(pad_to=128)); ref is padded to match."""
    b, p, c4 = taps.shape
    c = ref.shape[-1]
    g = gm.shape[1]
    hwp = p // num_depth
    assert hwp % 128 == 0, "pad depth slices to 128-point multiples"
    assert ref.shape[1] == hwp

    tile = _tile_rows(hwp, c4, c, taps.dtype.itemsize)
    nj = hwp // tile
    # d iterates FASTEST so the reference-feature block index is unchanged
    # across the D inner steps and stays VMEM-resident.
    grid = (b, nj, num_depth)
    interpret = jax.default_backend() == "cpu"

    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, g, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile, c4),
                lambda bi, j, d: (bi, d * nj + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, tile),
                lambda bi, j, d: (bi, 0, d * nj + j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile, c), lambda bi, j, d: (bi, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((c, g), lambda bi, j, d: (0, 0), memory_space=pltpu.VMEM),  # gm f32

        ],
        out_specs=pl.BlockSpec(
            (1, g, tile),
            lambda bi, j, d: (bi, 0, d * nj + j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(taps, w4, ref, gm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def warped_group_similarity(taps, w4, ref, gm, num_depth):
    """Fused similarity: taps [B, P, 4C], w4 [B, 4, P], ref [B, HWP, C],
    gm [C, G] -> [B, G, P] (channel-first), with P = num_depth * HWP ordered
    (d, h, w). HWP must be a multiple of 128 for the Pallas path (use
    warp_taps(pad_to=128))."""
    if _use_jnp(taps.shape[1], num_depth):
        return _jnp_impl(taps, w4, ref, gm, num_depth)
    return _pallas_impl(taps, w4, ref, gm, num_depth)


def _use_jnp(points: int, num_depth: int) -> bool:
    """Route to the pure-jnp impl off-TPU (interpret-mode Pallas on XLA:CPU
    is both slow to run and slow to compile — a CPU train step measured
    ~15 s/step interpret vs sub-second jnp) and for non-tile shapes.
    PATCHMATCHNET_TPU_INTERPRET=1 forces the Pallas path anyway so the
    kernel unit tests (tests/test_pallas_kernels.py) exercise the real
    kernel semantics in interpret mode on CPU."""
    if os.environ.get("PATCHMATCHNET_TPU_INTERPRET"):
        return (points // num_depth) % 128 != 0
    return bool(
        os.environ.get("PATCHMATCHNET_TPU_NO_PALLAS")
        or (points // num_depth) % 128 != 0
        or jax.default_backend() == "cpu"
    )


def _bwd_kernel(num_depth, taps_ref, w4_ref, ref_ref, gm_ref, dout_ref,
                dtaps_ref, dw4_ref, dref_ref, dref_acc):
    """Fused backward: one VMEM pass produces all three input cotangents.

    d_prod = GM @ dout;  d_warped = d_prod * ref;
    d_taps[j] = d_warped * w4[j];  d_w4[j] = <d_warped, taps[j]>_c;
    d_ref = d_prod * warped (accumulated across the D grid steps that share
    the reference block — d iterates fastest, same layout as the forward).
    """
    d = pl.program_id(2)
    taps = taps_ref[0].astype(jnp.float32)  # [T, 4C]
    w4 = jnp.transpose(w4_ref[0])  # [T, 4]
    ref = ref_ref[0].astype(jnp.float32)  # [T, C]
    dout = dout_ref[0]  # [G, T] f32
    c = ref.shape[-1]
    # d_prod[t, c] = sum_g dout[g, t] * gm[c, g]
    d_prod = jax.lax.dot_general(
        dout, gm_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, C]
    d_warped = d_prod * ref
    warped = (
        taps[:, 0 * c : 1 * c] * w4[:, 0:1]
        + taps[:, 1 * c : 2 * c] * w4[:, 1:2]
        + taps[:, 2 * c : 3 * c] * w4[:, 2:3]
        + taps[:, 3 * c : 4 * c] * w4[:, 3:4]
    )

    @pl.when(d == 0)
    def _():
        dref_acc[:] = d_prod * warped

    @pl.when(d > 0)
    def _():
        dref_acc[:] = dref_acc[:] + d_prod * warped

    @pl.when(d == num_depth - 1)
    def _():
        dref_ref[0] = dref_acc[:].astype(dref_ref.dtype)

    for j in range(4):
        dtaps_ref[0, :, j * c : (j + 1) * c] = (
            d_warped * w4[:, j : j + 1]
        ).astype(dtaps_ref.dtype)
    # d_w4[j, t] = sum_c d_warped[t, c] * taps[t, jC + c]: a lane reduction
    # per tap would land [T, 1]-shaped (needing a transpose to reach the
    # lane-dense [4, T] output block), so realize it as one MXU contraction
    # with a 0/1 tap-selection matrix S[c4, j] = (c4 // C == j).
    m = taps * pltpu.repeat(d_warped, 4, axis=1)  # [T, 4C]
    c4 = 4 * c
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (c4, 4), 0) // c
        == jax.lax.broadcasted_iota(jnp.int32, (c4, 4), 1)
    ).astype(jnp.float32)
    dw4_ref[0] = jax.lax.dot_general(
        sel, m, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [4, T]


def _pallas_bwd(taps, w4, ref, gm, dout, num_depth):
    b, p, c4 = taps.shape
    c = ref.shape[-1]
    g = gm.shape[1]
    hwp = p // num_depth
    # in+out traffic is ~2x the forward's, plus the dref accumulator and
    # Mosaic's own stack temporaries: a 2x factor measured 76 KB OVER the
    # 16 MB scoped-vmem limit at the stage-3 bf16 backward (D=48, C=64),
    # so budget for 3x
    tile = _tile_rows(hwp, c4, c, 3 * max(taps.dtype.itemsize, 2))
    nj = hwp // tile
    grid = (b, nj, num_depth)
    interpret = jax.default_backend() == "cpu"
    dtaps, dw4, dref = pl.pallas_call(
        functools.partial(_bwd_kernel, num_depth),
        out_shape=(
            jax.ShapeDtypeStruct(taps.shape, taps.dtype),
            jax.ShapeDtypeStruct(w4.shape, jnp.float32),
            jax.ShapeDtypeStruct(ref.shape, ref.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c4), lambda bi, j, d: (bi, d * nj + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tile), lambda bi, j, d: (bi, 0, d * nj + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, j, d: (bi, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, g), lambda bi, j, d: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, tile), lambda bi, j, d: (bi, 0, d * nj + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, c4), lambda bi, j, d: (bi, d * nj + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tile), lambda bi, j, d: (bi, 0, d * nj + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda bi, j, d: (bi, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((tile, c), jnp.float32)],
        interpret=interpret,
    )(taps, w4, ref, gm, dout)
    return dtaps, dw4.astype(w4.dtype), dref


def _fwd(taps, w4, ref, gm, num_depth):
    out = warped_group_similarity(taps, w4, ref, gm, num_depth)
    return out, (taps, w4, ref, gm)


def _bwd(num_depth, residuals, grad_out):
    # VJP contract: gm is NONDIFFERENTIABLE (its cotangent is zero on every
    # path). It is always the constant block-diagonal group-mean matrix
    # (models/patchmatch.py _group_mean_matrix); a learned/derived gm would
    # need the extra [C, G] contraction added to BOTH branches here.
    taps, w4, ref, gm = residuals
    if (
        _use_jnp(taps.shape[1], num_depth)
        or os.environ.get("PATCHMATCHNET_TPU_JNP_BWD")
    ):
        _, vjp = jax.vjp(
            lambda t, w, r: _jnp_impl(t, w, r, gm, num_depth), taps, w4, ref
        )
        dtaps, dw4, dref = vjp(grad_out)
        return dtaps, dw4, dref, jnp.zeros_like(gm)
    dtaps, dw4, dref = _pallas_bwd(taps, w4, ref, gm, grad_out, num_depth)
    return dtaps, dw4, dref, jnp.zeros_like(gm)


warped_group_similarity.defvjp(_fwd, _bwd)
