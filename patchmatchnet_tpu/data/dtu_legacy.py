"""Legacy raw-DTU dataset (Rectified/ + Depths_raw/ + Cameras_1/ layout).

Capability parity with the reference legacy loader (reference:
datasets/dtu_yao.py): 7 hard-coded light indexes, intrinsics x4 upscale (cam
files are given at 1/4 resolution), HR depth/mask prepared by nearest 2x
downsample + center crop 1600x1200 -> 640x512, mask = visual PNG > 10,
robust random source-view sampling.

Prefer converting raw DTU once with `cli convert-dtu` and using the unified
MVSDataset; this loader exists for drop-in parity with the reference's
legacy training path (train_dtu.py).
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict, Iterator, List, Tuple

import numpy as np
from PIL import Image

from patchmatchnet_tpu.dataio import read_cam_file, read_image, read_map, read_pair_file

NUM_LIGHT_IDX = 7
CROP_H, CROP_W = 512, 640


def prepare_hr_image(hr_img: np.ndarray) -> np.ndarray:
    """Nearest 2x downsample then center crop to 512x640
    (reference: dtu_yao.py:11-22). Input [H, W] -> output [512, 640]."""
    ds = hr_img[::2, ::2]  # nearest with factor 2 == strided slice
    h, w = ds.shape
    start_h, start_w = (h - CROP_H) // 2, (w - CROP_W) // 2
    return ds[start_h : start_h + CROP_H, start_w : start_w + CROP_W]


def read_mask_hr(filename: str) -> np.ndarray:
    raw = (np.array(Image.open(filename), dtype=np.float32) > 10).astype(np.float32)
    return prepare_hr_image(raw) > 0


def read_depth_hr(filename: str) -> np.ndarray:
    return prepare_hr_image(read_map(filename)[:, :, 0]).astype(np.float32)


class DTULegacyDataset:
    """Raw DTU training dataset with the reference sample schema."""

    def __init__(
        self,
        data_path: str,
        list_file: str,
        num_views: int = 5,
        robust_train: bool = False,
    ) -> None:
        self.data_path = data_path
        self.num_views = num_views
        self.robust_train = robust_train

        with open(list_file) as f:
            scans = [line.rstrip() for line in f.readlines()]

        pair_data = read_pair_file(os.path.join(data_path, "Cameras_1/pair.txt"))
        self.metas: List[Tuple[str, int, int, List[int]]] = []
        for scan in scans:
            for light_idx in range(NUM_LIGHT_IDX):
                self.metas += [(scan, light_idx, ref, src) for ref, src in pair_data]

    def __len__(self) -> int:
        return len(self.metas)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        scan, light_idx, ref_view, src_views = self.metas[idx]

        if self.robust_train:
            chosen = random.sample(range(len(src_views)), self.num_views - 1)
            view_ids = [ref_view] + [src_views[i] for i in chosen]
        else:
            view_ids = [ref_view] + src_views[: self.num_views - 1]

        images: List[np.ndarray] = []
        intrinsics: List[np.ndarray] = []
        extrinsics: List[np.ndarray] = []
        depth_gt = np.empty(0, np.float32)
        mask = np.empty(0, bool)
        depth_min = depth_max = -1.0

        for i, vid in enumerate(view_ids):
            # image filenames are 1-based
            img_path = os.path.join(
                self.data_path,
                f"Rectified/{scan}_train/rect_{vid + 1:03d}_{light_idx}_r5000.png",
            )
            image, _, _ = read_image(img_path)
            images.append(image)

            intrinsic, extrinsic, depth_params = read_cam_file(
                os.path.join(self.data_path, f"Cameras_1/train/{vid:08d}_cam.txt")
            )
            intrinsic = intrinsic.copy()
            intrinsic[:2, :] *= 4.0  # cam files are at 1/4 resolution
            intrinsics.append(intrinsic)
            extrinsics.append(extrinsic)

            if i == 0:
                depth_min = float(depth_params[0])
                depth_max = float(depth_params[1])
                mask = read_mask_hr(
                    os.path.join(
                        self.data_path, f"Depths_raw/{scan}/depth_visual_{vid:04d}.png"
                    )
                )
                depth_gt = read_depth_hr(
                    os.path.join(
                        self.data_path, f"Depths_raw/{scan}/depth_map_{vid:04d}.pfm"
                    )
                )

        return {
            "images": np.stack(images),  # [N, H, W, 3]
            "intrinsics": np.stack(intrinsics),
            "extrinsics": np.stack(extrinsics),
            "depth_min": np.float32(depth_min),
            "depth_max": np.float32(depth_max),
            "depth_gt": depth_gt,  # [512, 640]
            "mask": mask,  # [512, 640] bool
            "filename": os.path.join(scan, "{}", f"{view_ids[0]:08d}" + "{}"),
        }

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for i in range(len(self)):
            yield self[i]
