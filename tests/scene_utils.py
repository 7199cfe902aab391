"""Synthetic calibrated test scene written in the unified MVS layout.

A textured fronto-parallel plane at z = PLANE_Z viewed by N cameras with
identity rotation and small x-offsets. Per-view GT depth is analytic
(constant PLANE_Z + t_z), images are photo-consistent samples of a smooth
world texture — usable for dataset tests and end-to-end fusion tests with
known geometry.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from patchmatchnet_tpu.dataio import save_cam_file, save_image, save_pair_file, save_pfm

PLANE_Z = 6.0


def world_texture(x: np.ndarray, y: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Smooth RGB texture over world XY coordinates, values in [0, 1].

    `scale` multiplies the spatial frequency: at 1.0 the wavelength is ~2
    world units (~60 px at the default camera geometry) — matchable but
    weakly localized; 6-8 gives sharp enough gradients that PatchMatch
    reconstructs the plane to ~1% of depth even at 128x160 (measured)."""
    x = scale * x
    y = scale * y
    r = 0.5 + 0.45 * np.sin(3.1 * x) * np.cos(2.3 * y)
    g = 0.5 + 0.45 * np.sin(1.7 * x + 1.0) * np.sin(2.9 * y)
    b = 0.5 + 0.45 * np.cos(2.1 * x) * np.sin(1.3 * y + 0.5)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def make_synthetic_scene(
    root: str,
    num_views: int = 3,
    height: int = 64,
    width: int = 80,
    image_extension: str = ".png",
    with_depth_gt: bool = True,
    texture_scale: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Write images/, cams/, pair.txt (and depth_gt/) under `root`.

    Returns (intrinsics [3,3], extrinsics [N,4,4]).
    """
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "cams"), exist_ok=True)
    if with_depth_gt:
        os.makedirs(os.path.join(root, "depth_gt"), exist_ok=True)

    f = 1.1 * max(height, width)
    k = np.array(
        [[f, 0, width / 2.0], [0, f, height / 2.0], [0, 0, 1]], dtype=np.float32
    )

    extrinsics = []
    uu, vv = np.meshgrid(np.arange(width), np.arange(height))
    for v in range(num_views):
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = 0.35 * (v - (num_views - 1) / 2.0)  # t_x
        extrinsics.append(e)

        # Backproject pixels at the plane depth to world XY (R = I).
        depth = PLANE_Z  # camera z == world z since t_z = 0
        xs = (uu - k[0, 2]) / k[0, 0] * depth - e[0, 3]
        ys = (vv - k[1, 2]) / k[1, 1] * depth - e[1, 3]
        img = world_texture(xs, ys, texture_scale)
        img_path = os.path.join(root, "images", f"{v:08d}{image_extension}")
        if image_extension in (".jpg", ".jpeg"):
            # 4:4:4, high quality: default 4:2:0 chroma subsampling shifts
            # chroma half a pixel, which measurably biases matching on
            # colored texture (signed depth bias doubled, +0.048 vs +0.021
            # at the 128x160 fixture geometry)
            from PIL import Image

            Image.fromarray((img * 255).astype(np.uint8)).save(
                img_path, quality=95, subsampling=0
            )
        else:
            save_image(img_path, img)

        depth_params = [0.8 * PLANE_Z, 1.3 * PLANE_Z]
        save_cam_file(
            os.path.join(root, "cams", f"{v:08d}_cam.txt"), k, e, depth_params
        )

        if with_depth_gt:
            gt = np.full((height, width), depth, dtype=np.float32)
            save_pfm(os.path.join(root, "depth_gt", f"{v:08d}.pfm"), gt)

    pairs = []
    for v in range(num_views):
        srcs = [(s, 10.0 - abs(s - v)) for s in range(num_views) if s != v]
        pairs.append((v, srcs))
    save_pair_file(os.path.join(root, "pair.txt"), pairs)

    return k, np.stack(extrinsics)
