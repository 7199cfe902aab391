#!/usr/bin/env python
"""TPU check: windowed-sampler custom VJP on an ESCAPING geometry.

The CPU test (tests/test_windowed_similarity.py::test_windowed_proj_vjp_
with_escapes_pf1) exercises the _jnp_windowed oracle on both sides; this
script drives the REAL Pallas forward + backward kernels on the TPU and
compares d_quad / d_ref against the oracle, for both the pf=1 (C4>=128)
and pf=2 (C4=64) band layouts. Escaped samples must contribute exactly
zero in BOTH directions (the ADVICE r4 high finding: a sign-only backward
mask let above-band escapes on the pf=1 path emit garbage cotangents).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
    _coords_from_depth,
    _jnp_windowed,
    escape_count,
    make_config,
    make_quad_table_2d,
    windowed_group_similarity_proj,
)


def run_case(c: int, label: str) -> bool:
    rng = np.random.default_rng(11)
    b, h, w, d, g = 1, 64, 48, 8, 8
    feat = jnp.asarray(rng.random((b, h, w, c), np.float32), jnp.bfloat16)
    ref = jnp.asarray(rng.random((b, h, w, c), np.float32), jnp.bfloat16)
    # identity-ish projection; the teleported hypothesis (dep=0.25) shifts
    # 32 rows: in-image but far outside any band covering its ref row
    mat = np.zeros((b, 12), np.float32)
    mat[:, 0] = 1.0
    mat[:, 5] = 1.0
    mat[:, 10] = 1.0
    mat[:, 7] = 8.0
    mat12 = jnp.asarray(mat)
    depth_np = rng.random((b, d, h, w)).astype(np.float32) * 2 + 4
    depth_np[:, 3, :24, :] = 0.25
    depth = jnp.asarray(depth_np)
    gm = jnp.asarray(
        np.kron(np.eye(g, dtype=np.float32), np.ones((c // g, 1), np.float32) * (g / c))
    )
    cfg = make_config(h, w)
    assert (cfg.hp, cfg.wp) == (h, w)
    quad = make_quad_table_2d(feat)
    ix, iy = _coords_from_depth(mat12, depth, h, w)
    esc = int(
        jax.jit(escape_count, static_argnums=(2, 3, 4, 5, 6))(
            ix, iy, cfg, h, w, quad.shape[1], quad.shape[2]
        )
    )
    assert esc > 0, "fixture must actually escape"
    cot = jnp.asarray(rng.standard_normal((b, g, d, h, w)), jnp.float32)

    @jax.jit
    def grads_custom(q, r):
        return jax.grad(
            lambda q_, r_: jnp.sum(
                windowed_group_similarity_proj(q_, mat12, depth, r_, gm, cfg) * cot
            ),
            argnums=(0, 1),
        )(q, r)

    @jax.jit
    def grads_oracle(q, r):
        return jax.grad(
            lambda q_, r_: jnp.sum(
                _jnp_windowed(q_, ix, iy, r_, gm, cfg, h, w) * cot
            ),
            argnums=(0, 1),
        )(q, r)

    (dq1, dr1) = jax.tree.map(np.asarray, grads_custom(quad, ref))
    (dq2, dr2) = jax.tree.map(np.asarray, grads_oracle(quad, ref))
    dq_err = np.abs(dq1.astype(np.float32) - dq2.astype(np.float32))
    dr_err = np.abs(dr1.astype(np.float32) - dr2.astype(np.float32))
    # relative criterion with a magnitude floor: bf16 ULP scales with the
    # gradient magnitude. Measured on TPU v5e (2026-08-19): worst pf=2
    # d_ref err = 8.8e-3 at |g|=0.227 (~4 accumulated ULP over the D=8
    # hypothesis sum), located at ref row 41 — OUTSIDE the escape rows
    # (<24), with per-row max rel err flat at 0.012-0.035 across ALL rows.
    # The escape bug this guards put O(1) garbage on zero-gradient cells
    # (rel ~4.0 against the 0.25 floor), 100x above this band.
    dq_rel = (dq_err / np.maximum(np.abs(dq2.astype(np.float32)), 0.25)).max()
    dr_rel = (dr_err / np.maximum(np.abs(dr2.astype(np.float32)), 0.25)).max()
    ok = dq_rel < 5e-2 and dr_rel < 5e-2
    print(
        f"{label}: escapes={esc} d_quad max|err|={dq_err.max():.2e} "
        f"(rel {dq_rel:.2e}) mean={dq_err.mean():.2e}; "
        f"d_ref max|err|={dr_err.max():.2e} (rel {dr_rel:.2e}) "
        f"-> {'OK' if ok else 'FAIL'}"
    )
    return ok


def main():
    print(f"devices: {jax.devices()}")
    ok = run_case(32, "pf=1 (C=32, C4=128)")
    ok &= run_case(16, "pf=2 (C=16, C4=64)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
