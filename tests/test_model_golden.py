"""End-to-end numerical parity against captured reference outputs.

The fixture in tests/golden/ was produced by tools/dev/make_golden.py from the
upstream PyTorch implementation + the released params_000007.ckpt, with the
stage-3 random-initialization noise captured so the run is replayable. This
test runs the converted checkpoint through our model with identical noise and
asserts per-stage depth closeness — SURVEY §4's checkpoint-conversion
round-trip requirement.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchmatchnet_tpu.compat import load_variables
from patchmatchnet_tpu.models import PatchmatchNet

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "forward_96x128.npz")
CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "params_000007.msgpack")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def outputs(golden):
    variables = load_variables(CKPT)
    model = PatchmatchNet()
    depth, confidence, dp = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(golden["images"])[None],
        jnp.asarray(golden["intrinsics"])[None],
        jnp.asarray(golden["extrinsics"])[None],
        jnp.asarray([golden["depth_min"]]),
        jnp.asarray([golden["depth_max"]]),
        train=False,
        init_noise=jnp.asarray(golden["noise"]),
    )
    return np.asarray(depth), np.asarray(confidence), jax.tree.map(np.asarray, dp)


def _report(name, ours, ref, depth_range):
    diff = np.abs(ours - ref)
    rel = diff / depth_range
    return f"{name}: max abs {diff.max():.3e} mean abs {diff.mean():.3e} max rel {rel.max():.3e}"


@pytest.mark.parametrize(
    "stage,it", [(3, 0), (3, 1), (2, 0), (2, 1), (1, 0), (0, 0)]
)
def test_stage_depths_match(golden, outputs, stage, it):
    _, _, dp = outputs
    ours = dp[stage][it]
    ref = golden[f"stage{stage}_iter{it}"]
    depth_range = float(golden["depth_max"] - golden["depth_min"])
    assert ours.shape == ref.shape
    # Bit-close: everything is f32 on CPU on both sides; tolerance covers
    # conv-algorithm differences between XLA and torch accumulating through
    # 4 cascade stages.
    np.testing.assert_allclose(
        ours, ref, atol=2e-3 * depth_range, rtol=0,
        err_msg=_report(f"stage{stage}_iter{it}", ours, ref, depth_range),
    )
    # Mean error must be far tighter than max.
    assert np.abs(ours - ref).mean() < 2e-4 * depth_range


def test_final_depth_and_confidence_match(golden, outputs):
    depth, confidence, _ = outputs
    depth_range = float(golden["depth_max"] - golden["depth_min"])
    np.testing.assert_allclose(depth, golden["depth"], atol=2e-3 * depth_range, rtol=0)
    # Confidence gathers a 4-wide probability window at floor(expected index)
    # (reference: net.py:289-299); ~1e-7 score reordering can flip that index
    # at isolated pixels, so allow a tiny fraction of window-flip outliers.
    diff = np.abs(confidence - golden["confidence"])
    assert (diff > 5e-3).mean() < 1e-3, f"{(diff > 5e-3).sum()} pixels off"
    assert np.median(diff) < 1e-4
    assert diff.max() < 0.25
