#!/usr/bin/env python
"""Compare windowed vs gather sampler full-model outputs on TPU at the bench
config, and report escape counts per warp."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np


def run(sampler, height=864, width=1152):
    os.environ["PATCHMATCHNET_TPU_SAMPLER"] = sampler
    import jax
    import jax.numpy as jnp
    from bench import build_inputs
    from patchmatchnet_tpu.compat import load_variables
    from patchmatchnet_tpu.models import PatchmatchNet

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                        "checkpoints", "params_000007.msgpack")
    variables = load_variables(ckpt)
    model = PatchmatchNet(compute_dtype=jnp.bfloat16)

    @jax.jit
    def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
        d, c, _ = model.apply(variables, images, intrinsics, extrinsics,
                              depth_min, depth_max, train=False, init_noise=noise)
        return d, c

    inputs = jax.tree.map(jnp.asarray, build_inputs(1, 5, height, width))
    d, c = forward(*inputs)
    return np.asarray(d), np.asarray(c)


def escapes(height=864, width=1152):
    """Escape counts for every warp of the forward (captured coords)."""
    import jax
    import jax.numpy as jnp
    import patchmatchnet_tpu.ops.warp as warp_mod
    from bench import build_inputs
    from patchmatchnet_tpu.compat import load_variables
    from patchmatchnet_tpu.models import PatchmatchNet
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
        escape_count, make_config)

    cap = []
    orig = warp_mod.warp_grid

    def capture(src_proj, ref_proj, depth_samples, src_h, src_w):
        g = orig(src_proj, ref_proj, depth_samples, src_h, src_w)
        cap.append((g, src_h, src_w))
        return g

    warp_mod.warp_grid = capture
    try:
        ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                            "checkpoints", "params_000007.msgpack")
        variables = load_variables(ckpt)
        model = PatchmatchNet(compute_dtype=jnp.bfloat16)

        @jax.jit
        def forward(images, intrinsics, extrinsics, depth_min, depth_max, noise):
            cap.clear()
            model.apply(variables, images, intrinsics, extrinsics,
                        depth_min, depth_max, train=False, init_noise=noise)
            counts = []
            for g, sh, sw in cap:
                cfg = make_config(g.shape[2], g.shape[3])
                if cfg is None:
                    counts.append(jnp.int32(-1))
                    continue
                ix = (g[..., 0] + 1.0) * 0.5 * (sw - 1)
                iy = (g[..., 1] + 1.0) * 0.5 * (sh - 1)
                th = max(-(-(sh + 1) // 8) * 8, 24)
                tw = -(-(sw + 1) // 16) * 16
                esc = escape_count(ix, iy, cfg, sh, sw, th, tw)
                counts.append(jnp.stack([esc, esc * 0, esc * 0]))
            return jnp.stack(counts), jnp.asarray([g.shape[1] * g.shape[2] * g.shape[3] for g, _, _ in cap])

        inputs = jax.tree.map(jnp.asarray, build_inputs(1, 5, height, width))
        counts, totals = forward(*inputs)
        return np.asarray(counts), np.asarray(totals)
    finally:
        warp_mod.warp_grid = orig


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode == "escapes":
        counts, totals = escapes()
        for i, (c, t) in enumerate(zip(counts.tolist(), totals.tolist())):
            print(f"warp {i:2d}: x_esc {c[0]:8d}  band_esc {c[1]:8d}  ywin_esc {c[2]:8d}  of {t}")
    else:
        d_w, c_w = run("windowed")
        d_g, c_g = run("gather")
        dd = np.abs(d_w - d_g)
        print(f"depth range: {d_g.min():.1f}..{d_g.max():.1f}")
        print(f"|depth diff|: mean {dd.mean():.4g} median {np.median(dd):.4g} "
              f"p99 {np.percentile(dd, 99):.4g} max {dd.max():.4g}")
        cd = np.abs(c_w - c_g)
        print(f"|conf diff|: mean {cd.mean():.4g} max {cd.max():.4g}")
