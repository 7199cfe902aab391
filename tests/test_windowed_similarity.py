"""Windowed warp-sampling kernel: window semantics, table construction, and
model-level sampler equivalence (reference semantics anchor:
/root/reference/models/module.py:130-181 warping + patchmatch.py:198-217
group correlation)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
    HWIN_MAX,
    WindowConfig,
    escape_count,
    make_config,
    make_quad_table_2d,
    windowed_group_similarity,
)
from patchmatchnet_tpu.ops.quad_sample import make_quad_image


def _group_mean(c, g):
    gm = np.zeros((c, g), np.float32)
    cg = c // g
    for i in range(g):
        gm[i * cg:(i + 1) * cg, i] = 1.0 / cg
    return jnp.asarray(gm)


def _oracle(feature, ix, iy, ref, gm):
    """Unwindowed bilinear warp + group correlation (zeros padding)."""
    f = np.asarray(feature, np.float32)
    b, h, w, c = f.shape
    fp = np.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x0 = np.floor(np.asarray(ix))
    y0 = np.floor(np.asarray(iy))
    fx = np.asarray(ix) - x0
    fy = np.asarray(iy) - y0
    x0v = ((x0 >= 0) & (x0 <= w - 1)).astype(np.float32)
    x1v = ((x0 >= -1) & (x0 <= w - 2)).astype(np.float32)
    y0v = ((y0 >= 0) & (y0 <= h - 1)).astype(np.float32)
    y1v = ((y0 >= -1) & (y0 <= h - 2)).astype(np.float32)
    xc = np.clip(x0, -1, w - 1).astype(int) + 1
    yc = np.clip(y0, -1, h - 1).astype(int) + 1
    bi = np.zeros(ix.shape[:1], int)[:, None, None, None]
    t00 = fp[bi, yc, xc]
    t01 = fp[bi, yc, np.minimum(xc + 1, w + 1)]
    t10 = fp[bi, np.minimum(yc + 1, h + 1), xc]
    t11 = fp[bi, np.minimum(yc + 1, h + 1), np.minimum(xc + 1, w + 1)]
    warped = (t00 * ((1 - fx) * (1 - fy) * x0v * y0v)[..., None]
              + t01 * (fx * (1 - fy) * x1v * y0v)[..., None]
              + t10 * ((1 - fx) * fy * x0v * y1v)[..., None]
              + t11 * (fx * fy * x1v * y1v)[..., None])
    prod = warped * np.asarray(ref, np.float32)[:, None]
    return np.einsum("bdhwc,cg->bgdhw", prod, np.asarray(gm))


def _smooth_coords(rng, b, d, h, w, spread=2.0):
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    ix = np.zeros((b, d, h, w), np.float32)
    iy = np.zeros((b, d, h, w), np.float32)
    for bb in range(b):
        for dd in range(d):
            ix[bb, dd] = xx + spread * np.sin(yy / 17.0) + 0.1 * dd + rng.random()
            iy[bb, dd] = yy + 0.8 * np.cos(xx / 23.0) + 0.05 * dd + rng.random()
    return ix, iy


def test_quad_table_2d_matches_flat_quad():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((1, 16, 32, 8)), jnp.float32)
    q2 = np.asarray(make_quad_table_2d(f))
    qflat = np.asarray(make_quad_image(f, "zeros").data)
    h, w = 16, 32
    for y in range(h + 1):
        for x in range(w + 1):
            np.testing.assert_array_equal(q2[0, y, x], qflat[0, y * (w + 2) + x])


def test_windowed_matches_oracle_when_covered():
    rng = np.random.default_rng(1)
    b, d, h, w, c, g = 1, 4, 16, 128, 16, 4
    feature = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    gm = _group_mean(c, g)
    ix, iy = _smooth_coords(rng, b, d, h, w)
    cfg = make_config(h, w)
    assert cfg is not None
    quad2d = make_quad_table_2d(feature)
    esc = int(escape_count(jnp.asarray(ix), jnp.asarray(iy), cfg, h, w,
                           quad2d.shape[1], quad2d.shape[2]))
    assert esc == 0, f"smooth field should be fully covered, {esc} escapes"
    out = np.asarray(windowed_group_similarity(
        quad2d, jnp.asarray(ix), jnp.asarray(iy), ref, gm, cfg))
    expect = _oracle(feature, ix, iy, ref, gm)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_windowed_zeroes_escapes_and_counts_them():
    rng = np.random.default_rng(2)
    b, d, h, w, c, g = 1, 2, 16, 128, 16, 4
    feature = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    gm = _group_mean(c, g)
    ix, iy = _smooth_coords(rng, b, d, h, w)
    # teleport a block of samples far away (in-image, but outside any
    # window that covers the rest of their tile)
    ix[0, 1, 4:6, 8:16] = 5.0
    iy[0, 1, 4:6, 8:16] = 2.0
    ix[0, 0, :, :] += 0.0
    ix[0, 1, :, 100:] = 20.0
    iy[0, 1, :, 100:] = 10.0
    cfg = make_config(h, w)
    quad2d = make_quad_table_2d(feature)
    esc = int(escape_count(jnp.asarray(ix), jnp.asarray(iy), cfg, h, w,
                           quad2d.shape[1], quad2d.shape[2]))
    assert esc > 0
    out = np.asarray(windowed_group_similarity(
        quad2d, jnp.asarray(ix), jnp.asarray(iy), ref, gm, cfg))
    expect = _oracle(feature, ix, iy, ref, gm)
    # covered samples still match; escaped ones are zero
    diff_mask = ~np.isclose(out, expect, rtol=1e-5, atol=1e-5)
    assert diff_mask.sum() > 0
    assert np.abs(out[diff_mask]).max() == 0.0


def test_off_image_samples_are_zero_without_escaping():
    rng = np.random.default_rng(3)
    b, d, h, w, c, g = 1, 2, 16, 128, 16, 4
    feature = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    gm = _group_mean(c, g)
    ix, iy = _smooth_coords(rng, b, d, h, w)
    ix[0, 1] = w + 50.0  # whole slice off-image (behind-camera push pattern)
    cfg = make_config(h, w)
    quad2d = make_quad_table_2d(feature)
    esc = int(escape_count(jnp.asarray(ix), jnp.asarray(iy), cfg, h, w,
                           quad2d.shape[1], quad2d.shape[2]))
    assert esc == 0  # off-image samples are invalid, not escapes
    out = np.asarray(windowed_group_similarity(
        quad2d, jnp.asarray(ix), jnp.asarray(iy), ref, gm, cfg))
    assert np.abs(out[0, :, 1]).max() == 0.0
    expect = _oracle(feature, ix, iy, ref, gm)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_windowed_padded_width_matches_oracle():
    """Width with no exact tile divisor: coords are edge-padded to the tile
    geometry and the output sliced back — results must equal the unpadded
    oracle everywhere."""
    rng = np.random.default_rng(4)
    b, d, h, w, c, g = 1, 4, 16, 104, 16, 4
    feature = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    gm = _group_mean(c, g)
    ix, iy = _smooth_coords(rng, b, d, h, w)
    cfg = make_config(h, w)
    assert (cfg.wp, cfg.hp) == (144, 16) and cfg.tw == 48
    quad2d = make_quad_table_2d(feature)
    esc = int(escape_count(jnp.asarray(ix), jnp.asarray(iy), cfg, h, w,
                           quad2d.shape[1], quad2d.shape[2]))
    assert esc == 0
    out = np.asarray(windowed_group_similarity(
        quad2d, jnp.asarray(ix), jnp.asarray(iy), ref, gm, cfg))
    assert out.shape == (b, g, d, h, w)
    expect = _oracle(feature, ix, iy, ref, gm)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_windowed_proj_variant_matches_coords():
    """The proj variant (in-kernel coordinate math from depth + 3x4
    projection scalars) must match the explicit-coordinate path."""
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
        _coords_from_depth,
        windowed_group_similarity_proj,
    )

    rng = np.random.default_rng(5)
    b, d, h, w, c, g = 1, 4, 16, 128, 16, 4
    feature = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    gm = _group_mean(c, g)
    # a gentle projective map: near-identity rotation row-major 3x4
    mat = np.array(
        [[1.0, 0.002, 0.5, 2.0],
         [-0.001, 1.0, 0.3, 1.0],
         [1e-5, -2e-5, 1.0, 0.05]], np.float32
    )
    mat12 = jnp.asarray(mat.reshape(1, 12))
    depth = jnp.asarray(
        8.0 + rng.random((b, d, h, w)).astype(np.float32) * 2.0
    )
    cfg = make_config(h, w)
    quad2d = make_quad_table_2d(feature)
    out = np.asarray(
        windowed_group_similarity_proj(quad2d, mat12, depth, ref, gm, cfg)
    )
    ix, iy = _coords_from_depth(mat12, depth, h, w)
    expect = np.asarray(
        windowed_group_similarity(quad2d, ix, iy, ref, gm, cfg)
    )
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_tile_width_selection():
    assert make_config(96, 128).tw == 64
    # non-multiple dims are edge-padded to the tile geometry
    cfg = make_config(100, 144)
    assert (cfg.th, cfg.hp) == (8, 104)
    assert make_config(108, 144).hp == 112
    assert make_config(104, 144).tw == 48
    assert make_config(432, 576).tw == 48  # smallest >= TW_DEFAULT divisor wins
    cfg = make_config(80, 104)  # no exact divisor: narrowest tile + padding
    assert (cfg.tw, cfg.wp) == (48, 144)
    cfg = make_config(864, 216)  # DTU stage-2 width pads 216 -> 240
    assert (cfg.tw, cfg.wp, cfg.hp) == (48, 240, 864)


@pytest.mark.slow
def test_model_sampler_equivalence_bf16():
    """Full-model forward: windowed sampler == gather sampler (CPU jnp paths)
    on a smooth multi-view scene. Slow: full-model eager init + two eager
    applies at 96x128."""
    from patchmatchnet_tpu.models import PatchmatchNet

    rng = np.random.default_rng(7)
    b, n, h, w = 1, 3, 96, 128
    images = jnp.asarray(rng.random((b, n, h, w, 3)), jnp.float32)
    k = np.array([[150.0, 0, w / 2], [0, 150.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(k, (b, n, 3, 3)))
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    for v in range(n):
        extr[:, v, 0, 3] = 0.4 * (v - 1)
    extr = jnp.asarray(extr)
    dmin, dmax = jnp.asarray([4.0]), jnp.asarray([12.0])

    model = PatchmatchNet(compute_dtype=jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, images, intr, extr, dmin, dmax, train=False)
    noise = jax.random.uniform(jax.random.PRNGKey(2), (b, 48, h // 8, w // 8))

    def run():
        depth, conf, _ = model.apply(
            variables, images, intr, extr, dmin, dmax,
            train=False, init_noise=noise,
        )
        return np.asarray(depth), np.asarray(conf)

    os.environ["PATCHMATCHNET_TPU_SAMPLER"] = "windowed"
    try:
        d_win, c_win = run()
    finally:
        os.environ["PATCHMATCHNET_TPU_SAMPLER"] = "gather"
    try:
        d_gat, c_gat = run()
    finally:
        del os.environ["PATCHMATCHNET_TPU_SAMPLER"]

    # same bf16 payloads, same f32 weights/accumulation; differences only
    # from summation order in the similarity reduction
    np.testing.assert_allclose(d_win, d_gat, rtol=0, atol=2e-2)
    assert np.median(np.abs(d_win - d_gat)) < 2e-3
    np.testing.assert_allclose(c_win, c_gat, rtol=0, atol=2e-2)


def test_windowed_proj_custom_vjp_matches_autodiff():
    """The custom VJP of windowed_group_similarity_proj must equal autodiff
    through the (differentiable) windowed impl: gradients flow to the quad
    table and reference features only; depth/projections carry none
    (reference builds the warp grid under no_grad, module.py:147)."""
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
        _wgsp_impl,
        windowed_group_similarity_proj,
    )

    rng = np.random.default_rng(3)
    b, h, w, c, d, g = 1, 16, 48, 8, 8, 4
    feat = jnp.asarray(rng.random((b, h, w, c), np.float32))
    ref = jnp.asarray(rng.random((b, h, w, c), np.float32))
    depth = jnp.asarray(rng.random((b, d, h, w), np.float32) * 2 + 4)
    mat = np.zeros((b, 12), np.float32)
    mat[:, 0] = 1.0
    mat[:, 5] = 1.0
    mat[:, 11] = 1.0
    mat[:, 2] = 1.7
    mat[:, 6] = 0.9
    mat12 = jnp.asarray(mat)
    gm = _group_mean(c, g)
    cfg = make_config(h, w)
    quad = make_quad_table_2d(feat)
    cot = jnp.asarray(rng.standard_normal((b, g, d, h, w)), jnp.float32)

    def loss_custom(q, r):
        return jnp.sum(windowed_group_similarity_proj(q, mat12, depth, r, gm, cfg) * cot)

    def loss_auto(q, r):
        return jnp.sum(_wgsp_impl(q, mat12, depth, r, gm, cfg) * cot)

    dq1, dr1 = jax.grad(loss_custom, argnums=(0, 1))(quad, ref)
    dq2, dr2 = jax.grad(loss_auto, argnums=(0, 1))(quad, ref)
    np.testing.assert_allclose(np.asarray(dq1), np.asarray(dq2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr1), np.asarray(dr2), rtol=1e-5, atol=1e-5)

    # depth and projection must carry no gradient through the sampler
    d_depth = jax.grad(
        lambda dd: jnp.sum(
            windowed_group_similarity_proj(quad, mat12, dd, ref, gm, cfg) * cot
        )
    )(depth)
    assert float(jnp.max(jnp.abs(d_depth))) == 0.0


def test_windowed_proj_vjp_with_escapes_pf1():
    """Custom-VJP correctness ON AN ESCAPING GEOMETRY, pf=1 path (C4=128,
    the stage-2/3 shape class). Samples that escape the window band
    contribute exactly zero in the forward; their cotangents must also be
    exactly zero in the backward — the Pallas backward kernel recomputes
    the band index in-kernel and must agree with the forward about which
    samples matched nothing (an above-band index >= K matches no one-hot
    row yet is >= 0, so a sign-only mask silently corrupts d_quad)."""
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
        _coords_from_depth,
        _jnp_windowed,
        escape_count,
        windowed_group_similarity_proj,
    )

    rng = np.random.default_rng(11)
    b, h, w, c, d, g = 1, 64, 48, 32, 8, 8  # c4 = 128 -> pf == 1
    feat = jnp.asarray(rng.random((b, h, w, c), np.float32))
    ref = jnp.asarray(rng.random((b, h, w, c), np.float32))
    # identity-ish projection with a translation that makes iy depend on
    # depth: iy = v + m7/dep. Normal depths (4..6) shift ~1.5-2 rows; the
    # teleported hypothesis (dep = 0.25) shifts 32 rows -> in-image but far
    # outside any band that covers its ref row.
    mat = np.zeros((b, 12), np.float32)
    mat[:, 0] = 1.0   # rx = u
    mat[:, 5] = 1.0   # ry = v
    mat[:, 10] = 1.0  # rz = 1 -> pz = dep
    mat[:, 7] = 8.0   # py = v*dep + 8
    mat12 = jnp.asarray(mat)
    depth_np = rng.random((b, d, h, w)).astype(np.float32) * 2 + 4
    depth_np[:, 3, :24, :] = 0.25  # escape block (rows stay < 64: in-image)
    depth = jnp.asarray(depth_np)
    gm = _group_mean(c, g)
    cfg = make_config(h, w)
    assert (cfg.hp, cfg.wp) == (h, w)  # exact tiling, no padding effects
    quad = make_quad_table_2d(feat)
    ix, iy = _coords_from_depth(mat12, depth, h, w)
    esc = int(escape_count(ix, iy, cfg, h, w, quad.shape[1], quad.shape[2]))
    assert esc > 0, "fixture must actually escape"
    cot = jnp.asarray(rng.standard_normal((b, g, d, h, w)), jnp.float32)

    def loss_custom(q, r):
        return jnp.sum(
            windowed_group_similarity_proj(q, mat12, depth, r, gm, cfg) * cot
        )

    def loss_oracle(q, r):
        out = _jnp_windowed(q, ix, iy, r, gm, cfg, h, w)
        return jnp.sum(out * cot)

    dq1, dr1 = jax.grad(loss_custom, argnums=(0, 1))(quad, ref)
    dq2, dr2 = jax.grad(loss_oracle, argnums=(0, 1))(quad, ref)
    # tolerance: the Pallas kernel's band matmul rounds through bf16 on the
    # MXU (~3e-3 max on O(1) grads); the escape bug this test guards put
    # ~1.0-magnitude garbage on 27% of d_quad, far above this band
    dq_err = np.abs(np.asarray(dq1) - np.asarray(dq2))
    assert dq_err.max() < 1e-2, f"d_quad max err {dq_err.max()}"
    assert dq_err.mean() < 1e-4, f"d_quad mean err {dq_err.mean()}"
    np.testing.assert_allclose(np.asarray(dr1), np.asarray(dr2),
                               rtol=1e-2, atol=1e-2)


def test_views_fused_matches_per_view_weighted_sum():
    """The views-fused entry (one kernel accumulating the view-weighted
    similarity across sources, used whenever view weights are known —
    reference semantics: models/patchmatch.py:198-217 weighted view
    aggregation) equals the per-view path times weights, summed."""
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
        _coords_from_depth,
        _pad_spatial,
        windowed_group_similarity_proj,
        windowed_group_similarity_proj_views,
    )

    rng = np.random.default_rng(7)
    b, v, h, w, c, d, g = 1, 3, 32, 48, 16, 8, 4
    feats = jnp.asarray(rng.random((b, v, h, w, c), np.float32))
    ref = jnp.asarray(rng.random((b, h, w, c), np.float32))
    mats = np.zeros((b, v, 12), np.float32)
    for i in range(v):
        mats[:, i, 0] = 1.0
        mats[:, i, 5] = 1.0
        mats[:, i, 10] = 1.0
        mats[:, i, 3] = 0.3 * i
        mats[:, i, 7] = 0.2 * (i - 1)
    mats = jnp.asarray(mats)
    depth = jnp.asarray(rng.random((b, d, h, w)).astype(np.float32) * 2 + 4)
    gm = _group_mean(c, g)
    vw = jnp.asarray(rng.random((b, v, h, w)).astype(np.float32))
    cfg = make_config(h, w)
    quads = make_quad_table_2d(feats.reshape(b * v, h, w, c))
    quads = quads.reshape(b, v, *quads.shape[1:])

    fused = windowed_group_similarity_proj_views(
        quads, mats, depth, ref, gm, vw, cfg
    )
    expect = jnp.zeros_like(fused)
    for i in range(v):
        sim = windowed_group_similarity_proj(
            quads[:, i], mats[:, i], depth, ref, gm, cfg
        )
        expect = expect + sim * vw[:, i][:, None, None]
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(expect), rtol=1e-5, atol=1e-5
    )
