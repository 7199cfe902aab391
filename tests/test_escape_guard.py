"""Runtime escape guard for the windowed sampler (VERDICT r2 items 3/4).

Two halves of the no-silent-zero contract:

1. test_adversarial_geometry_escapes: REAL wide-baseline/strong-rotation
   geometry at the Tanks & Temples / ETH3D eval scales (reference:
   eval.sh:13-21 — num_views=7, image_max_dim 2048/2688) genuinely exceeds
   the windowed kernel's measured locality bounds — the in-graph
   escape counter fires (coordinates-only check; cheap).
2. test_escape_guard_gather_fallback: when the counter fires on a batch,
   DepthEstimator transparently re-runs it on the exact gather sampler and
   returns output identical to a pure-gather estimator (reference semantics
   anchor: models/module.py:130-181, whose warp is exact everywhere).
   Escapes are forced deterministically via the band-height knob so the
   full-model path stays cheap on the CPU test backend.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchmatchnet_tpu.models.patchmatch import init_random_depth
from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
    _coords_from_depth,
    _pad_spatial,
    escape_count,
    make_config,
)
from patchmatchnet_tpu.ops.warp import warp_proj_coeffs


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


@pytest.mark.parametrize(
    "name,full_h,full_w",
    [("tanks", 1056, 1920), ("eth3d", 1792, 2688)],
)
def test_adversarial_geometry_escapes(name, full_h, full_w):
    """Stage-3 full-range stratified init at wide baseline + 12-degree
    rotation: the per-tile sample spread exceeds the source window, so the
    escape counter MUST be nonzero — these geometries are exactly why the
    runtime guard exists (silent zeros otherwise)."""
    h, w = full_h // 8, full_w // 8  # stage-3 resolution
    cfg = make_config(h, w)
    assert cfg is not None
    f = 1.1 * max(full_h, full_w) / 8
    ks = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    ref_proj = np.eye(4, dtype=np.float32)
    ref_proj[:3, :4] = ks @ np.eye(3, 4, dtype=np.float32)

    e = np.eye(4, dtype=np.float32)
    e[:3, :3] = _rot_y(np.deg2rad(12.0))
    e[:3, 3] = [1.0, 0.05, 0.02]  # baseline ~ 1/6 of scene depth
    src_proj = np.eye(4, dtype=np.float32)
    src_proj[:3, :4] = ks @ e[:3, :4]

    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.random((1, 48, h, w)).astype(np.float32))
    dep = init_random_depth(noise, jnp.asarray([3.0]), jnp.asarray([12.0]))
    dep_p, _, _ = _pad_spatial(dep, dep, None, cfg)
    mat = warp_proj_coeffs(jnp.asarray(src_proj)[None], jnp.asarray(ref_proj)[None])
    ix, iy = _coords_from_depth(mat, dep_p, h, w)
    table_h = max(-(-(h + 1) // 8) * 8, 48)
    table_w = -(-(w + 1) // 16) * 16
    esc = int(escape_count(ix, iy, cfg, h, w, table_h, table_w))
    assert esc > 0, f"{name}: expected escapes at this geometry, got 0"


def test_per_stage_demotion_is_sticky():
    """Fallback controller semantics (no model compile): when ONLY stage 3
    escapes, the estimator demotes stage 3 to gather, keeps stages 1-2
    windowed, and remembers the demotion per shape — the next batch at that
    shape runs the mixed program directly (one run, not run + re-run).
    Measured need: ETH3D portrait geometry escapes ~2.6M stage-3 samples on
    every batch (PROGRESS.md round 4)."""
    from patchmatchnet_tpu.infer import DepthEstimator

    est = DepthEstimator.__new__(DepthEstimator)  # controller only
    est.bucket_multiple = 0
    est.mesh = None
    est._forwards = {}
    est._stage_override = {}
    est._derive_windows = False  # plain demotion semantics under test
    est._windows = {}
    est._retunes = {}
    est.escape_fallbacks = 0

    traces = []  # (sampler, stages) seen at TRACE time by each program

    def fwd(images, intr, extr, dmin, dmax, noise):
        sampler = os.environ.get("PATCHMATCHNET_TPU_SAMPLER", "windowed")
        stages = os.environ.get("PATCHMATCHNET_TPU_WINDOWED_STAGES", "1,2,3")
        traces.append((sampler, stages))
        b, _, h, w = images.shape[:4]
        esc = jnp.zeros((3,), jnp.int32)
        if sampler == "windowed" and "3" in stages.split(","):
            esc = esc.at[2].set(7)  # stage 3 escapes; 1-2 never do
        return jnp.zeros((b, h, w)), jnp.zeros((b, h, w)), esc

    est._forward_fn = fwd
    est._forward = jax.jit(fwd)

    b, n, h, w = 1, 2, 16, 32
    batch = {
        "images": np.zeros((b, n, h, w, 3), np.float32),
        "intrinsics": np.zeros((b, n, 3, 3), np.float32),
        "extrinsics": np.zeros((b, n, 4, 4), np.float32),
        "depth_min": np.asarray([1.0], np.float32),
        "depth_max": np.asarray([2.0], np.float32),
    }
    with pytest.warns(UserWarning, match=r"stage\(s\) \['3'\]"):
        est(batch, jax.random.PRNGKey(0))
    assert est.escape_fallbacks == 1
    assert est._stage_override == {(h, w): "1,2"}

    # second batch at the same shape: mixed program runs directly, cached
    est(batch, jax.random.PRNGKey(1))
    assert est.escape_fallbacks == 1
    assert traces == [("windowed", "1,2,3"), ("windowed", "1,2")]


def _controller_est(fwd, derive_windows, spec_fn=None, windowed=True):
    """Bare DepthEstimator controller around a fake forward (no compile)."""
    from patchmatchnet_tpu.infer import DepthEstimator

    est = DepthEstimator.__new__(DepthEstimator)
    est.bucket_multiple = 0
    est.mesh = None
    est._forwards = {}
    est._stage_override = {}
    est._derive_windows = derive_windows
    est._windows = {}
    est._retunes = {}
    est.escape_fallbacks = 0
    est._forward_fn = fwd
    est._forward = jax.jit(fwd)
    if spec_fn is not None:
        est._derive_spec = spec_fn
    if derive_windows:
        est._windowed_active = lambda: windowed
    return est


def _tiny_batch(h=16, w=32):
    b, n = 1, 2
    return {
        "images": np.zeros((b, n, h, w, 3), np.float32),
        "intrinsics": np.zeros((b, n, 3, 3), np.float32),
        "extrinsics": np.zeros((b, n, 4, 4), np.float32),
        "depth_min": np.asarray([1.0], np.float32),
        "depth_max": np.asarray([2.0], np.float32),
    }


def test_first_batch_derivation_sets_windows_and_demotes_unsound():
    """derive_windows=True: the first batch at a shape derives per-stage
    (tw, hband) BEFORE running (stages the derivation proves unsound start
    on gather directly — no escape round trip), and the derived windows are
    visible to the traced program via the per-stage env overrides."""
    traces = []

    def fwd(images, intr, extr, dmin, dmax, noise):
        traces.append(
            (
                os.environ.get("PATCHMATCHNET_TPU_WINDOWED_STAGES", "1,2,3"),
                os.environ.get("PATCHMATCHNET_TPU_WIN_S1"),
                os.environ.get("PATCHMATCHNET_TPU_WIN_S2"),
                os.environ.get("PATCHMATCHNET_TPU_WIN_S3"),
            )
        )
        b, _, h, w = images.shape[:4]
        return (
            jnp.zeros((b, h, w)),
            jnp.zeros((b, h, w)),
            jnp.zeros((3,), jnp.int32),
        )

    spec = {1: (48, 6), 2: (32, 8), 3: None}  # stage 3 unsound
    est = _controller_est(fwd, True, spec_fn=lambda b, h, w: dict(spec))
    h, w = 16, 32
    est(_tiny_batch(h, w), jax.random.PRNGKey(0))
    assert est._stage_override == {(h, w): "1,2"}
    assert est._windows == {(h, w): ((1, 48, 6), (2, 32, 8))}
    assert est.escape_fallbacks == 0  # no run-and-rerun round trip
    # second batch: cached program, no re-derivation trace
    est(_tiny_batch(h, w), jax.random.PRNGKey(1))
    assert traces == [("1,2", "48,6", "32,8", None)]


def test_escape_retunes_once_then_demotes():
    """derive_windows=True: an escape at a windowed stage re-derives from
    the escaping batch and retries with the new window once; if the stage
    escapes AGAIN it is demoted to gather (bounded recompiles)."""
    calls = []

    def fwd(images, intr, extr, dmin, dmax, noise):
        stages = os.environ.get("PATCHMATCHNET_TPU_WINDOWED_STAGES", "1,2,3")
        win3 = os.environ.get("PATCHMATCHNET_TPU_WIN_S3")
        calls.append((stages, win3))
        b, _, h, w = images.shape[:4]
        esc = jnp.zeros((3,), jnp.int32)
        if "3" in stages.split(","):
            esc = esc.at[2].set(5)  # stage 3 always escapes, any window
        return jnp.zeros((b, h, w)), jnp.zeros((b, h, w)), esc

    specs = iter([{3: (48, 7)}, {3: (32, 11)}, {3: (32, 13)}])
    est = _controller_est(
        fwd, True, spec_fn=lambda b, h, w: dict(next(specs))
    )
    h, w = 16, 32
    with pytest.warns(UserWarning):
        est(_tiny_batch(h, w), jax.random.PRNGKey(0))
    # initial derived (48,7) escaped -> retune to (32,11) -> escaped again
    # -> demoted (retune budget 1 per (shape, stage))
    assert est._stage_override == {(h, w): "1,2"}
    assert est._windows == {(h, w): ()}
    assert est.escape_fallbacks == 2
    assert calls == [
        ("1,2,3", "48,7"),
        ("1,2,3", "32,11"),
        ("1,2", None),
    ]


@pytest.mark.slow
def test_escape_guard_gather_fallback():
    """End-to-end guard mechanism: escapes detected at run time ->
    DepthEstimator warns, re-runs on the exact gather sampler, and matches a
    pure-gather estimator bit-for-bit. Escapes are forced with
    PATCHMATCHNET_TPU_HBAND=2 (a legal band height too short for any real
    warp) so the full forward stays small."""
    from patchmatchnet_tpu.infer import DepthEstimator
    from patchmatchnet_tpu.models import PatchmatchNet

    rng = np.random.default_rng(3)
    b, n, h, w = 1, 3, 96, 384
    f = 1.1 * w
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    extr[:, 1, 0, 3] = 0.5
    extr[:, 2, 0, 3] = -0.5
    batch = {
        "images": rng.random((b, n, h, w, 3)).astype(np.float32),
        "intrinsics": np.broadcast_to(k, (b, n, 3, 3)).copy(),
        "extrinsics": extr,
        "depth_min": np.asarray([3.0], np.float32),
        "depth_max": np.asarray([12.0], np.float32),
    }

    model = PatchmatchNet(compute_dtype=jnp.bfloat16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(batch["images"]), jnp.asarray(batch["intrinsics"]),
        jnp.asarray(batch["extrinsics"]), jnp.asarray(batch["depth_min"]),
        jnp.asarray(batch["depth_max"]), train=False,
    )

    os.environ["PATCHMATCHNET_TPU_HBAND"] = "2"
    try:
        # derive_windows=False: the derivation would compute a SOUND band
        # (ignoring the forced-short env band) and defeat the forcing —
        # this test exercises the raw demote-and-rerun path
        est = DepthEstimator(variables, model, derive_windows=False)
        with pytest.warns(UserWarning, match="escaped"):
            d_guarded, c_guarded = est(batch, jax.random.PRNGKey(7))
        assert est.escape_fallbacks == 1
    finally:
        del os.environ["PATCHMATCHNET_TPU_HBAND"]

    os.environ["PATCHMATCHNET_TPU_SAMPLER"] = "gather"
    try:
        est_gather = DepthEstimator(variables, model)
        d_gather, c_gather = est_gather(batch, jax.random.PRNGKey(7))
    finally:
        del os.environ["PATCHMATCHNET_TPU_SAMPLER"]
    assert est_gather.escape_fallbacks == 0

    # same program either way; the residual ~1e-5 is XLA-CPU oneDNN conv
    # nondeterminism between two compiles (computation-order dependent), not
    # a sampler difference
    np.testing.assert_allclose(d_guarded, d_gather, rtol=1e-5, atol=1e-4)
    # confidence gathers probability mass at the regressed index; an ulp
    # flip at a near-tie moves a pixel one bin, so give it a looser bound
    np.testing.assert_allclose(c_guarded, c_gather, rtol=0, atol=1e-2)
