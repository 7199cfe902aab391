"""Space-to-depth conv folding: exactness of the folded kernels and of the
FeatureNet inference prefix (reference graph: models/net.py:9-70; the fold
exists because full-res C=3..16 NHWC convs waste the 128-lane minor dim on
TPU — see ops/space_to_depth.py and PROGRESS.md round 5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patchmatchnet_tpu.models.feature import FeatureNet
from patchmatchnet_tpu.ops.space_to_depth import (
    fold_conv_kernel,
    fold_image,
    folded_conv_geometry,
    raw_fold_conv_geometry,
    raw_fold_conv_kernel,
    unfold_image,
)


def _direct(x, w, s, p):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "k,s,ci,co,f_in",
    [(3, 1, 3, 8, 4), (3, 1, 8, 8, 4), (5, 2, 8, 16, 4),
     (3, 1, 16, 16, 2), (5, 2, 16, 32, 2)],
)
def test_folded_conv_exact(k, s, ci, co, f_in):
    """fold -> folded conv -> unfold == direct conv, for every prefix
    layer geometry in the FeatureNet plan."""
    rng = np.random.default_rng(0)
    p = k // 2
    x = jnp.asarray(rng.standard_normal((1, 16, 24, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1, jnp.float32)
    ref = _direct(x, w, s, p)
    kf, pl, ph, f_out = folded_conv_geometry(k, s, p, f_in)
    wf = fold_conv_kernel(w, s, p, f_in)
    yf = jax.lax.conv_general_dilated(
        fold_image(x, f_in), wf, (1, 1), ((pl, ph), (pl, ph)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = unfold_image(yf, f_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_raw_fold_conv_exact():
    """conv0's raw-input form: a 6x6 stride-4 conv emitting fold-4 output
    directly equals conv 3x3 s1 followed by fold_image (kernel support =
    (f_out-1)*s + k = 6)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8)) * 0.1, jnp.float32)
    ref = fold_image(_direct(x, w, 1, 1), 4)
    kf, stride, pl, ph = raw_fold_conv_geometry(3, 1, 1, 4)
    assert (kf, stride, pl, ph) == (6, 4, 1, 1)
    wf = raw_fold_conv_kernel(w, 1, 1, 4)
    got = jax.lax.conv_general_dilated(
        x, wf, (stride, stride), ((pl, ph), (pl, ph)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fold_unfold_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 8, 12, 5)), jnp.float32)
    for f in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(unfold_image(fold_image(x, f), f)), np.asarray(x)
        )


def test_featurenet_s2d_prefix_matches_reference_graph(monkeypatch):
    """FeatureNet inference with the s2d prefix equals the layer-by-layer
    graph (which golden-parity tests pin to the torch reference)."""
    net = FeatureNet()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 48, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(1)}, x, True)
    # run one training step's worth of BN stats updates so running stats
    # are non-trivial
    _, updates = net.apply(
        variables, x * 2.0 + 0.1, True, mutable=["batch_stats"]
    )
    variables = {"params": variables["params"], **updates}

    monkeypatch.setenv("PATCHMATCHNET_TPU_S2D", "0")
    ref = jax.jit(lambda v, x: net.apply(v, x, False))(variables, x)
    monkeypatch.setenv("PATCHMATCHNET_TPU_S2D", "1")
    got = jax.jit(lambda v, x: net.apply(v, x, False))(variables, x)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=1e-5
        )


# (no non-divisible-input test: the model contract already requires H, W
# multiples of 8 — net.py:109-113 — so the %4 gate in FeatureNet.__call__
# can only be false for inputs the model rejects anyway; it exists as a
# defensive guard for direct FeatureNet users.)
