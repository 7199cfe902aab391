"""Depth-map filtering and fusion into a colored point cloud.

Capability parity with the reference fusion (reference: eval.py:193-297):
photometric mask from confidence, geometric mask from cross-view
consistency, depth averaged over consistent views, masks saved as PNGs,
masked pixels backprojected to world and written as a binary PLY.

TPU-native difference: per-source-view consistency checks are vmapped and
jitted, so each reference view is one device call over all of its source
views instead of the reference's serial CPU loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from patchmatchnet_tpu.dataio import (
    read_cam_file,
    read_image,
    read_map,
    read_pair_file,
    save_image,
    save_ply,
)
from patchmatchnet_tpu.geometry import (
    backproject_to_world,
    check_geometric_consistency,
)


@dataclass
class FusionConfig:
    image_max_dim: int = -1
    geo_pixel_thres: float = 1.0
    geo_depth_thres: float = 0.01
    geo_mask_thres: int = 5
    photo_thres: float = 0.5
    file_format: str = ".pfm"
    image_extension: str = ".jpg"
    save_masks: bool = True


@partial(jax.jit, static_argnames=("geo_pixel_thres", "geo_depth_thres"))
def _consistency_all_sources(
    ref_depth,
    ref_intr,
    ref_extr,
    src_depths,
    src_intrs,
    src_extrs,
    *,
    geo_pixel_thres: float,
    geo_depth_thres: float,
):
    """vmapped consistency over V source views.

    Returns (geo_mask_sum [H, W] int32, depth_reprojected_sum [H, W])."""
    masks, reprojected = jax.vmap(
        lambda d, k, e: check_geometric_consistency(
            ref_depth, ref_intr, ref_extr, d, k, e,
            geo_pixel_thres, geo_depth_thres,
        )
    )(src_depths, src_intrs, src_extrs)
    return jnp.sum(masks.astype(jnp.int32), axis=0), jnp.sum(reprojected, axis=0)


def _load_view(
    input_folder: str,
    output_folder: str,
    scan: str,
    view: int,
    cfg: FusionConfig,
    with_image: bool,
) -> Tuple[Optional[np.ndarray], np.ndarray, np.ndarray, np.ndarray]:
    """Load (image?, intrinsics, extrinsics, depth_est) for one view with
    max-dim rescaling applied consistently to intrinsics."""
    img_path = os.path.join(
        input_folder, scan, "images", f"{view:08d}{cfg.image_extension}"
    )
    image, orig_h, orig_w = read_image(img_path, cfg.image_max_dim)
    intr, extr, _ = read_cam_file(
        os.path.join(input_folder, scan, "cams", f"{view:08d}_cam.txt")
    )
    intr = intr.copy()
    intr[0] *= image.shape[1] / orig_w
    intr[1] *= image.shape[0] / orig_h
    depth = read_map(
        os.path.join(output_folder, scan, "depth_est", f"{view:08d}{cfg.file_format}")
    )
    depth = depth[:, :, 0] if depth.ndim == 3 else depth
    return (image if with_image else None), intr, extr, depth.astype(np.float32)


def filter_and_fuse(
    input_folder: str,
    output_folder: str,
    scan: str = "",
    cfg: Optional[FusionConfig] = None,
    verbose: bool = True,
) -> str:
    """Fuse one scan's depth maps into `<output_folder>/<scan>/fused.ply`.

    Returns the written PLY path.
    """
    cfg = cfg or FusionConfig()
    pair_data = read_pair_file(os.path.join(input_folder, scan, "pair.txt"))

    vertices: List[np.ndarray] = []
    vertex_colors: List[np.ndarray] = []

    for ref_view, src_views in pair_data:
        ref_img, ref_intr, ref_extr, ref_depth = _load_view(
            input_folder, output_folder, scan, ref_view, cfg, with_image=True
        )
        confidence = read_map(
            os.path.join(
                output_folder, scan, "confidence", f"{ref_view:08d}{cfg.file_format}"
            )
        )
        confidence = confidence[:, :, 0] if confidence.ndim == 3 else confidence
        photo_mask = confidence > cfg.photo_thres

        src_depths, src_intrs, src_extrs = [], [], []
        for sv in src_views:
            _, intr, extr, depth = _load_view(
                input_folder, output_folder, scan, sv, cfg, with_image=False
            )
            src_depths.append(depth)
            src_intrs.append(intr)
            src_extrs.append(extr)

        geo_sum, reproj_sum = _consistency_all_sources(
            jnp.asarray(ref_depth),
            jnp.asarray(ref_intr),
            jnp.asarray(ref_extr),
            jnp.asarray(np.stack(src_depths)),
            jnp.asarray(np.stack(src_intrs)),
            jnp.asarray(np.stack(src_extrs)),
            geo_pixel_thres=cfg.geo_pixel_thres,
            geo_depth_thres=cfg.geo_depth_thres,
        )
        geo_sum = np.asarray(geo_sum)
        reproj_sum = np.asarray(reproj_sum)

        depth_avg = (reproj_sum + ref_depth) / (geo_sum + 1)
        geo_mask = geo_sum >= cfg.geo_mask_thres
        final_mask = photo_mask & geo_mask

        if cfg.save_masks:
            mask_dir = os.path.join(output_folder, scan, "mask")
            os.makedirs(mask_dir, exist_ok=True)
            save_image(os.path.join(mask_dir, f"{ref_view:08d}_photo.png"), photo_mask)
            save_image(os.path.join(mask_dir, f"{ref_view:08d}_geo.png"), geo_mask)
            save_image(os.path.join(mask_dir, f"{ref_view:08d}_final.png"), final_mask)

        if verbose:
            print(
                f"processing {os.path.join(input_folder, scan)}, ref-view{ref_view:03d}, "
                f"geo_mask:{geo_mask.mean():3f} photo_mask:{photo_mask.mean():3f} "
                f"final_mask:{final_mask.mean():3f}"
            )

        world = np.asarray(
            backproject_to_world(
                jnp.asarray(depth_avg.astype(np.float32)),
                jnp.asarray(ref_intr),
                jnp.asarray(ref_extr),
            )
        )
        vertices.append(world[final_mask])
        vertex_colors.append((ref_img[final_mask] * 255).astype(np.uint8))

    xyz = np.concatenate(vertices, axis=0)
    rgb = np.concatenate(vertex_colors, axis=0)
    ply_path = os.path.join(output_folder, scan, "fused.ply")
    save_ply(ply_path, xyz, rgb)
    if verbose:
        print(f"saving the final model to {ply_path} ({xyz.shape[0]} points)")
    return ply_path
