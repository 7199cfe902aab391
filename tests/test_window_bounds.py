"""Derived window-band requirements (ops/pallas/window_bounds.py).

The derived band must cover EVERY hypothesis the model can draw in
[depth_min, depth_max] — validated here against the real `escape_count`
diagnostic on densely sampled inverse-depth planes, including the ETH3D
portrait geometry class that round 4 measured escaping (~2.6M samples at
the stage-3 full-range init with HBAND_DEFAULT; VERDICT r4 item 3 asks
for exactly this test: portrait runs windowed with 0 escapes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bench import build_inputs
from patchmatchnet_tpu.ops.pallas.window_bounds import (
    derive_stage_bands,
    derive_stage_windows,
    required_band,
    stage_mats_np,
)
from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
    HBAND_DEFAULT,
    _coords_from_depth,
    escape_count,
    make_config,
)


def _dense_escapes(mats, dmin, dmax, hs, ws, hband, num_planes=48, tw=None):
    """escape_count over dense inverse-depth planes at a stage geometry
    (a superset-density stand-in for every sampler the model runs)."""
    inv = np.linspace(1.0 / dmax, 1.0 / dmin, num_planes, dtype=np.float32)
    depth = jnp.asarray(
        np.broadcast_to((1.0 / inv)[None, :, None, None],
                        (1, num_planes, hs, ws)).copy()
    )
    cfg = make_config(hs, ws, hband=hband, tw=tw)
    hq, wq = hs + 1, ws + 1
    table_h = max(-(-hq // 8) * 8, 48)
    table_w = -(-wq // 16) * 16
    total = 0
    for mat in np.asarray(mats, np.float32).reshape(-1, 12):
        ix, iy = _coords_from_depth(jnp.asarray(mat)[None], depth, hs, ws)
        total += int(escape_count(ix, iy, cfg, hs, ws, table_h, table_w))
    return total


def _stage_dims(h, w, stage):
    return h >> stage, w >> stage


def test_derived_band_covers_bench_geometry():
    """DTU bench geometry: derivation must produce a usable band (<= hwin)
    that yields zero escapes on dense hypotheses at every stage."""
    _, intr, extr, dmin, dmax, _ = build_inputs(1, 5, 864, 1152)
    bands = derive_stage_bands(
        intr[0], extr[0], float(dmin[0]), float(dmax[0]), 864, 1152
    )
    for stage, band in bands.items():
        assert band is not None, f"stage {stage} must be windowable"
        hs, ws = _stage_dims(864, 1152, stage)
        mats = stage_mats_np(intr[0], extr[0], stage)
        assert _dense_escapes(
            mats, float(dmin[0]), float(dmax[0]), hs, ws, band
        ) == 0, f"stage {stage} escaped at derived band {band}"


def test_portrait_geometry_stage3_windowed_with_derived_window():
    """ETH3D portrait class (2688x1792, N=7 — the geometry round 4 measured
    escaping ~2.6M samples at HBAND_DEFAULT): at the DEFAULT tile width the
    band requirement is the epipolar tilt across the tile, which overflows
    the window (derive_stage_bands -> None, the round-4 demotion). The
    JOINT (tw, hband) derivation must instead find a narrower tile whose
    band (a) fits the window and (b) gives ZERO escapes on dense
    hypotheses — i.e. this geometry now runs stage 3 windowed instead of
    demoting to gather. Reference anchor: eval.sh:13-15 (the ETH3D eval
    config)."""
    h, w = 2688, 1792
    _, intr, extr, dmin, dmax, _ = build_inputs(1, 7, h, w)
    hs, ws = _stage_dims(h, w, 3)
    mats = stage_mats_np(intr[0], extr[0], 3)

    esc_default = _dense_escapes(
        mats, float(dmin[0]), float(dmax[0]), hs, ws, HBAND_DEFAULT
    )
    assert esc_default > 0, (
        "fixture regression: the portrait geometry is supposed to escape "
        "at the default band (round-4 measurement)"
    )

    wins = derive_stage_windows(
        intr[0], extr[0], float(dmin[0]), float(dmax[0]), h, w, stages=(3,)
    )
    assert wins[3] is not None, "joint derivation must find a sound window"
    tw, band = wins[3]
    cfg = make_config(hs, ws, hband=band, tw=tw)
    assert band <= cfg.hwin
    assert _dense_escapes(
        mats, float(dmin[0]), float(dmax[0]), hs, ws, band, tw=tw
    ) == 0


@pytest.mark.slow
def test_model_honors_window_override_env():
    """PATCHMATCHNET_TPU_WIN_S{stage} must reach the traced model: a bf16
    forward with a derived-style override runs the windowed sampler at the
    overridden geometry and still matches the default-window forward
    (the windowed sampler is exact wherever it covers; both configs cover
    this tame geometry)."""
    import os

    import jax
    from patchmatchnet_tpu.models import PatchmatchNet

    rng = np.random.default_rng(5)
    b, n, h, w = 1, 2, 32, 64
    f = 1.1 * w
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    extr[:, 1, 0, 3] = 0.3
    args = (
        jnp.asarray(rng.random((b, n, h, w, 3)).astype(np.float32)),
        jnp.asarray(np.broadcast_to(k, (b, n, 3, 3)).copy()),
        jnp.asarray(extr),
        jnp.asarray([3.0]),
        jnp.asarray([12.0]),
    )
    model = PatchmatchNet(
        compute_dtype=jnp.bfloat16, patchmatch_iteration=(1, 1, 1)
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        *args,
        train=False,
    )
    noise = jnp.asarray(
        rng.random((b, 48, h // 8, w // 8)).astype(np.float32)
    )

    def fwd():
        d, _, _ = jax.jit(
            lambda *a: model.apply(variables, *a, train=False, init_noise=noise)
        )(*args)
        return np.asarray(d)

    base = fwd()
    for s in (1, 2, 3):
        os.environ[f"PATCHMATCHNET_TPU_WIN_S{s}"] = "32,9"
    try:
        overridden = fwd()
    finally:
        for s in (1, 2, 3):
            del os.environ[f"PATCHMATCHNET_TPU_WIN_S{s}"]
    np.testing.assert_allclose(base, overridden, rtol=1e-4, atol=1e-3)


def test_required_band_rejects_extreme_geometry():
    """A 90-degree in-plane rotation swaps the epipolar direction: columns
    overflow any band -> derivation must return None (demote to gather),
    not a bogus band."""
    h, w = 256, 320
    _, intr, extr, dmin, dmax, _ = build_inputs(1, 2, h, w)
    rot = np.array(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32
    )
    extr = np.asarray(extr).copy()
    extr[0, 1, :3, :3] = rot @ extr[0, 1, :3, :3]
    mats = stage_mats_np(intr[0], extr[0], 1)
    hs, ws = _stage_dims(h, w, 1)
    hq, wq = hs + 1, ws + 1
    band = required_band(
        mats, float(dmin[0]), float(dmax[0]), hs, ws,
        max(-(-hq // 8) * 8, 48), -(-wq // 16) * 16,
    )
    assert band is None


def test_derived_band_not_pessimistic():
    """At the DTU bench geometry the measured row span was 5 (PROGRESS.md:
    HBAND_DEFAULT = 5 + covered row + ULP slack = 7). The derivation has
    one extra host-vs-device slack row, so it must land near that — a
    bound like 15 would mean the mirror is broken-conservative."""
    _, intr, extr, dmin, dmax, _ = build_inputs(1, 5, 864, 1152)
    bands = derive_stage_bands(
        intr[0], extr[0], float(dmin[0]), float(dmax[0]), 864, 1152
    )
    for stage, band in bands.items():
        assert band is not None and band <= HBAND_DEFAULT + 2, (
            f"stage {stage}: derived {band} vs measured-envelope "
            f"{HBAND_DEFAULT}"
        )
