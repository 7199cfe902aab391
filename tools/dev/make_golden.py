#!/usr/bin/env python
"""Generate golden fixtures from the upstream PyTorch reference implementation.

Runs the reference PatchmatchNet (pointed to by --reference-path) on a
synthetic calibrated 3-view scene with the released checkpoint, capturing the
stage-3 random initialization noise so the run is exactly replayable, and
writes inputs + all intermediate/final outputs to an .npz fixture.

The committed fixture (tests/golden/*.npz) lets the test suite verify
numerical parity without needing torch's reference code at test time.

Usage:
    python tools/dev/make_golden.py \
        --reference-path /root/reference \
        --output tests/golden/forward_96x128.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def make_scene(
    height: int,
    width: int,
    num_views: int,
    seed: int,
    depth_min: float = 4.0,
    depth_max: float = 12.0,
):
    """Synthetic calibrated scene: smooth random images, inward-looking cameras."""
    rng = np.random.default_rng(seed)

    # Smooth images: random low-res upsampled (gives gradients for matching).
    images = []
    for _ in range(num_views):
        low = rng.random((height // 8, width // 8, 3)).astype(np.float32)
        img = np.kron(low, np.ones((8, 8, 1), dtype=np.float32))
        img += 0.05 * rng.random((height, width, 3)).astype(np.float32)
        images.append(np.clip(img, 0.0, 1.0))
    images = np.stack(images)  # [N, H, W, 3]

    f = 1.2 * max(height, width)
    k = np.array(
        [[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1]], dtype=np.float32
    )
    intrinsics = np.stack([k] * num_views)

    # Baselines scale with the scene depth so triangulation angles stay
    # comparable across depth ranges (e.g. DTU-like 425..935 mm exercises
    # large-coordinate f32 warp math, BASELINE.json configs[0]).
    t_scale = 0.6 * (depth_min + depth_max) / 16.0
    extrinsics = []
    for v in range(num_views):
        angle = 0.08 * (v - (num_views - 1) / 2.0)
        c, s = np.cos(angle), np.sin(angle)
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        e[0, 3] = t_scale * (v - (num_views - 1) / 2.0)
        extrinsics.append(e)
    extrinsics = np.stack(extrinsics)

    return images, intrinsics, extrinsics, depth_min, depth_max


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference-path", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--output", required=True)
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--num-views", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--depth-min", type=float, default=4.0)
    parser.add_argument("--depth-max", type=float, default=12.0)
    args = parser.parse_args()

    sys.path.insert(0, args.reference_path)
    import torch

    from models.net import PatchmatchNet  # reference module

    ckpt_path = args.checkpoint or os.path.join(
        args.reference_path, "checkpoints", "params_000007.ckpt"
    )

    model = PatchmatchNet(
        patchmatch_interval_scale=[0.005, 0.0125, 0.025],
        propagation_range=[6, 4, 2],
        patchmatch_iteration=[1, 2, 2],
        patchmatch_num_sample=[8, 8, 16],
        propagate_neighbors=[0, 8, 16],
        evaluate_neighbors=[9, 9, 9],
    )
    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)["model"]
    state = {k[len("module."):] if k.startswith("module.") else k: v for k, v in state.items()}
    missing, unexpected = model.load_state_dict(state, strict=False)
    print("missing:", missing, "unexpected:", unexpected)
    model.eval()

    images, intrinsics, extrinsics, dmin, dmax = make_scene(
        args.height, args.width, args.num_views, args.seed,
        args.depth_min, args.depth_max,
    )

    # Capture the stage-3 stratified-random noise so runs are replayable.
    captured = {}
    real_rand = torch.rand

    def capturing_rand(*a, **kw):
        gen = torch.Generator().manual_seed(args.seed)
        kw.pop("device", None)
        out = real_rand(*a, generator=gen, **kw)
        captured["noise"] = out.numpy().copy()
        return out

    torch.rand = capturing_rand
    try:
        with torch.no_grad():
            depth, confidence, depth_patchmatch = model(
                [torch.from_numpy(im.transpose(2, 0, 1))[None] for im in images],
                torch.from_numpy(intrinsics)[None],
                torch.from_numpy(extrinsics)[None],
                torch.tensor([dmin]),
                torch.tensor([dmax]),
            )
    finally:
        torch.rand = real_rand

    out = {
        "images": images,
        "intrinsics": intrinsics,
        "extrinsics": extrinsics,
        "depth_min": np.float32(dmin),
        "depth_max": np.float32(dmax),
        "noise": captured["noise"],
        "depth": depth.numpy()[:, 0],  # [B, H, W]
        "confidence": confidence.numpy(),
    }
    for stage, depths in depth_patchmatch.items():
        for i, d in enumerate(depths):
            arr = d.numpy()
            out[f"stage{stage}_iter{i}"] = arr[:, 0] if arr.ndim == 4 else arr

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    np.savez_compressed(args.output, **out)
    print("wrote", args.output)
    for k, v in out.items():
        if hasattr(v, "shape"):
            print(f"  {k}: {v.shape}")


if __name__ == "__main__":
    main()
