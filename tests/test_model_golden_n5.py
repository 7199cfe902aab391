"""Second golden-parity fixture: 5 views (4 sources), 80x104, different seed.

Same methodology as test_model_golden.py — captured from the PyTorch
reference with replayable stage-3 noise; exercises the many-source-view
accumulation path and a different spatial geometry.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from patchmatchnet_tpu.compat import load_variables
from patchmatchnet_tpu.models import PatchmatchNet

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "forward_80x104_n5.npz")
CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "params_000007.msgpack")


def test_five_view_parity():
    g = np.load(GOLDEN)
    variables = load_variables(CKPT)
    model = PatchmatchNet()
    depth, confidence, dp = model.apply(
        variables,
        jnp.asarray(g["images"])[None],
        jnp.asarray(g["intrinsics"])[None],
        jnp.asarray(g["extrinsics"])[None],
        jnp.asarray([g["depth_min"]]),
        jnp.asarray([g["depth_max"]]),
        train=False,
        init_noise=jnp.asarray(g["noise"]),
    )
    depth_range = float(g["depth_max"] - g["depth_min"])
    for stage, it in [(3, 0), (3, 1), (2, 0), (2, 1), (1, 0), (0, 0)]:
        ours = np.asarray(dp[stage][it])
        ref = g[f"stage{stage}_iter{it}"]
        diff = np.abs(ours - ref)
        assert diff.max() < 2e-3 * depth_range, (
            f"stage{stage} iter{it}: max {diff.max():.2e}"
        )
        assert diff.mean() < 2e-4 * depth_range

    np.testing.assert_allclose(
        np.asarray(depth), g["depth"], atol=2e-3 * depth_range, rtol=0
    )
    cdiff = np.abs(np.asarray(confidence) - g["confidence"])
    assert (cdiff > 5e-3).mean() < 1e-3
    assert np.median(cdiff) < 1e-4
