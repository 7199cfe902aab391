"""Third golden-parity fixture: 400x288, 5 views, DTU-like depth range
425..935 (BASELINE.json configs[0] scale).

Large coordinate magnitudes stress the f32 warp math differently from the
depth-4..12 fixtures (projection matrices carry ~mm-scale translations and
the inverse-depth intervals are ~1e-5), so this guards the exact regime the
DTU headline metric runs in. Captured from the PyTorch reference with
replayable stage-3 noise (tools/dev/make_golden.py --depth-min 425
--depth-max 935).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchmatchnet_tpu.compat import load_variables
from patchmatchnet_tpu.models import PatchmatchNet

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "forward_288x400_n5_dtu.npz"
)
CKPT = os.path.join(
    os.path.dirname(__file__), "..", "checkpoints", "params_000007.msgpack"
)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="fixture not generated")
def test_dtu_range_parity():
    g = np.load(GOLDEN)
    variables = load_variables(CKPT)
    model = PatchmatchNet()
    depth, confidence, dp = jax.jit(
        lambda *a: model.apply(
            variables, *a, train=False, init_noise=jnp.asarray(g["noise"])
        )
    )(
        jnp.asarray(g["images"])[None],
        jnp.asarray(g["intrinsics"])[None],
        jnp.asarray(g["extrinsics"])[None],
        jnp.asarray([g["depth_min"]]),
        jnp.asarray([g["depth_max"]]),
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
