#!/usr/bin/env python
"""Per-(tile, neighbor) spread of LEARNED evaluation-grid offsets.

Decides feasibility of a windowed (gather-free) eval-grid kernel: for each
neighbor k the fixed dilated offset is constant (absorbed into a per-tile
window origin), so the window must only cover tile-extent + the spread of
the learned per-pixel offsets (eval_conv output) within the tile. Reports
the distribution of per-(tile, k) bbox extents at each cascade stage on the
bench inputs through the real checkpoint's FeatureNet + eval_conv.

Runs on CPU (feature extractor + one conv only).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_inputs
from patchmatchnet_tpu.compat import load_variables
from patchmatchnet_tpu.models import PatchmatchNet


def main(height=864, width=1152, th=8, tw=48):
    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..",
                        "checkpoints", "params_000007.msgpack")
    variables = load_variables(ckpt)
    model = PatchmatchNet()
    images, intr, extr, dmin, dmax, noise = build_inputs(1, 5, height, width)

    @jax.jit
    def features(img):
        return model.apply(variables, img, method=lambda m, x: m.feature(x, False))

    feats = features(jnp.asarray(images[:, 0]))  # ref view, {1,2,3}
    dil = {1: 6, 2: 4, 3: 2}  # propagation_out_range per stage
    for stage in (1, 2, 3):
        f = feats[stage]
        params = variables["params"][f"patchmatch_{stage}"]["eval_conv"]["conv2d"]
        d = dil[stage]
        off = jax.lax.conv_general_dilated(
            jnp.transpose(f, (0, 3, 1, 2)),
            jnp.transpose(params["kernel"], (3, 2, 0, 1)),
            (1, 1), [(d, d), (d, d)],
            rhs_dilation=(d, d),
        )
        off = jnp.transpose(off, (0, 2, 3, 1)) + params["bias"]
        b, h, w, k2 = off.shape
        k = k2 // 2
        o = np.asarray(off).reshape(b, h, w, k, 2)
        hp = -(-h // th) * th
        wp = -(-w // tw) * tw
        o = np.pad(o, ((0, 0), (0, hp - h), (0, wp - w), (0, 0), (0, 0)), mode="edge")
        t = o.reshape(b, hp // th, th, wp // tw, tw, k, 2)
        spread = t.max(axis=(2, 4)) - t.min(axis=(2, 4))  # [B, TY, TX, K, 2]
        mag = np.abs(o).reshape(-1, 2)
        print(f"stage {stage} ({h}x{w}, K={k}):")
        print(f"  |learned offset|: mean {mag.mean():.2f} p99 "
              f"{np.percentile(mag, 99):.2f} max {mag.max():.2f}")
        for axis, name in ((0, "x"), (1, "y")):
            s = spread[..., axis].ravel()
            print(f"  per-(tile,k) {name}-spread: mean {s.mean():.2f} p95 "
                  f"{np.percentile(s, 95):.2f} p99 {np.percentile(s, 99):.2f} "
                  f"max {s.max():.2f}")
        # per-(tile ROW, k) spread: sets the per-row band height for a
        # windowed eval-grid kernel (one band slice per ref row per k)
        rowt = o.reshape(b, hp, wp // tw, tw, k, 2)
        rspread = rowt.max(axis=3) - rowt.min(axis=3)  # [B, HP, TX, K, 2]
        ry = rspread[..., 1].ravel()
        print(f"  per-(row,k) y-spread: mean {ry.mean():.2f} p95 "
              f"{np.percentile(ry, 95):.2f} p99 {np.percentile(ry, 99):.2f} "
              f"max {ry.max():.2f}")
        # union-window extents per tile: learned-offset bbox over ALL k
        ut = np.transpose(t, (0, 1, 3, 2, 4, 5, 6)).reshape(
            b, hp // th, wp // tw, th * tw * k, 2
        )
        uspread = ut.max(axis=3) - ut.min(axis=3)
        for axis, name in ((0, "x"), (1, "y")):
            s = uspread[..., axis].ravel()
            print(f"  per-tile union {name}-spread (all k): mean {s.mean():.2f} "
                  f"p99 {np.percentile(s, 99):.2f} max {s.max():.2f}")


if __name__ == "__main__":
    main()
