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


class _ViewCache:
    """Per-scan decode-once store for fusion inputs.

    The reference fusion re-reads every source view's depth/cam once per
    REFERENCING view — O(refs x srcs) decodes per scan (reference:
    eval.py:203-250). Here cams and depth maps are read exactly once per
    view and kept for the scan (a 49-view DTU scan of 1600-wide maps is
    ~400 MB — well within host memory), and the image is decoded only for
    the view's own turn as reference: intrinsics rescaling needs just the
    image DIMENSIONS, which come from the file header without a decode."""

    def __init__(self, input_folder: str, output_folder: str, scan: str,
                 cfg: FusionConfig):
        self.input_folder = input_folder
        self.output_folder = output_folder
        self.scan = scan
        self.cfg = cfg
        self._cam_depth = {}

    def _img_path(self, view: int) -> str:
        return os.path.join(
            self.input_folder, self.scan, "images",
            f"{view:08d}{self.cfg.image_extension}",
        )

    def cam_depth(self, view: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(intrinsics, extrinsics, depth_est) — cached, no image decode."""
        hit = self._cam_depth.get(view)
        if hit is not None:
            return hit
        from patchmatchnet_tpu.dataio.image import read_image_size, scaled_dims

        orig_h, orig_w = read_image_size(self._img_path(view))
        h, w = scaled_dims(orig_h, orig_w, self.cfg.image_max_dim)
        intr, extr, _ = read_cam_file(
            os.path.join(
                self.input_folder, self.scan, "cams", f"{view:08d}_cam.txt"
            )
        )
        intr = intr.copy()
        intr[0] *= w / orig_w
        intr[1] *= h / orig_h
        depth = read_map(
            os.path.join(
                self.output_folder, self.scan, "depth_est",
                f"{view:08d}{self.cfg.file_format}",
            )
        )
        depth = depth[:, :, 0] if depth.ndim == 3 else depth
        out = (intr, extr, depth.astype(np.float32))
        self._cam_depth[view] = out
        return out

    def image(self, view: int) -> np.ndarray:
        """Decoded (rescaled) image — NOT cached: each view is a reference
        view exactly once per scan."""
        image, _, _ = read_image(self._img_path(view), self.cfg.image_max_dim)
        return image


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

    cache = _ViewCache(input_folder, output_folder, scan, cfg)
    for ref_view, src_views in pair_data:
        ref_intr, ref_extr, ref_depth = cache.cam_depth(ref_view)
        ref_img = cache.image(ref_view)
        confidence = read_map(
            os.path.join(
                output_folder, scan, "confidence", f"{ref_view:08d}{cfg.file_format}"
            )
        )
        confidence = confidence[:, :, 0] if confidence.ndim == 3 else confidence
        photo_mask = confidence > cfg.photo_thres

        src_depths, src_intrs, src_extrs = [], [], []
        for sv in src_views:
            intr, extr, depth = cache.cam_depth(sv)
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
