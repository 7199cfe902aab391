"""AOT export round trip (StableHLO serialize -> deserialize -> call)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchmatchnet_tpu.compat import export_inference, load_exported, load_variables
from patchmatchnet_tpu.models import PatchmatchNet

import os
CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "params_000007.msgpack")


def test_export_refuses_reduced_precision_model():
    """A bf16 model selects the windowed sampler, whose escape guard lives
    in the runtime estimator — a frozen artifact cannot carry it, so the
    export must refuse rather than bake in a silent-zero path."""
    variables = load_variables(CKPT)
    with pytest.raises(ValueError, match="full-precision"):
        export_inference(
            variables, 1, 2, 32, 40, model=PatchmatchNet(compute_dtype=jnp.bfloat16)
        )


@pytest.mark.slow
def test_export_roundtrip():
    variables = load_variables(CKPT)
    b, n, h, w = 1, 2, 32, 40
    blob = export_inference(variables, b, n, h, w)
    assert len(blob) > 100_000  # weights baked in

    exported = load_exported(blob)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, n, h, w, 3)), jnp.float32)
    k = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.broadcast_to(k, (b, n, 3, 3)))
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    extr[:, 1, 0, 3] = 0.4
    extr = jnp.asarray(extr)
    dmin = jnp.asarray([2.0])
    dmax = jnp.asarray([10.0])
    noise = jnp.asarray(rng.random((b, 48, h // 8, w // 8)), jnp.float32)

    depth_e, conf_e = exported.call(images, intr, extr, dmin, dmax, noise)

    model = PatchmatchNet()
    depth_d, conf_d, _ = model.apply(
        variables, images, intr, extr, dmin, dmax, train=False, init_noise=noise
    )
    # The deserialized artifact compiles without the session's global
    # matmul-precision override, so tolerate compilation-level drift.
    np.testing.assert_allclose(np.asarray(depth_e), np.asarray(depth_d), atol=2e-3)
    np.testing.assert_allclose(np.asarray(conf_e), np.asarray(conf_d), atol=2e-3)
