"""Unified MVS dataset (cam.txt / pair.txt layout) and host-side batching.

Capability parity with the reference dataset (reference: datasets/mvs.py):
scans from a scan list (or a single unlisted scene), optional light indexes,
metas (scan, light, ref, srcs) from pair files, per-sample view selection
(first-k or random under robust_train), max-dim rescale with intrinsics
adjustment, GT depth + `depth >= depth_min` mask.

TPU-native differences (static shapes for jit):
- all views of a sample are returned stacked [N, H, W, 3] at the REFERENCE
  view's resolution (per-view intrinsics rescaled accordingly; the reference
  keeps a ragged list, which torch can only batch when sizes agree anyway);
- the reference's in-graph `adjust_image_dims` (reference: net.py:304-318)
  is `adjust_sample_dims` here, applied host-side before jit.
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict, Iterator, List, Sequence, Tuple

import numpy as np

from patchmatchnet_tpu.dataio import (
    read_cam_file,
    read_image,
    read_map,
    read_pair_file,
    resize_bilinear_np,
)


def adjust_dims_multiple_of_8(height: int, width: int) -> Tuple[int, int]:
    """Round dimensions to the nearest multiple of 8 (reference rounding
    semantics: int(round(x / 8)) * 8)."""
    return int(round(height / 8)) * 8, int(round(width / 8)) * 8


def adjust_sample_dims(sample: Dict[str, Any]) -> Dict[str, Any]:
    """Stretch/compress images slightly so H, W are multiples of 8, rescaling
    intrinsics; records the original dims under 'orig_height'/'orig_width'."""
    images = sample["images"]
    n, height, width = images.shape[0], images.shape[1], images.shape[2]
    new_h, new_w = adjust_dims_multiple_of_8(height, width)
    out = dict(sample)
    out["orig_height"], out["orig_width"] = height, width
    if (new_h, new_w) != (height, width):
        from patchmatchnet_tpu import native as _native

        resized = (
            _native.resize_bilinear_batch(images.astype(np.float32), new_h, new_w)
            if images.dtype == np.float32
            else None
        )
        out["images"] = (
            resized
            if resized is not None
            else np.stack(
                [resize_bilinear_np(images[i], new_h, new_w) for i in range(n)]
            )
        )
        intr = sample["intrinsics"].copy()
        intr[:, 0] *= new_w / width
        intr[:, 1] *= new_h / height
        out["intrinsics"] = intr
    return out


class MVSDataset:
    """Scene index + sample loader over the unified MVS directory layout."""

    def __init__(
        self,
        data_path: str,
        num_views: int = 10,
        max_dim: int = -1,
        scan_list: str = "",
        num_light_idx: int = -1,
        cam_folder: str = "cams",
        pair_path: str = "pair.txt",
        image_folder: str = "images",
        depth_folder: str = "depth_gt",
        image_extension: str = ".jpg",
        robust_train: bool = False,
    ) -> None:
        self.data_path = data_path
        self.num_views = num_views
        self.max_dim = max_dim
        self.robust_train = robust_train
        self.cam_folder = cam_folder
        self.depth_folder = depth_folder
        self.image_folder = image_folder
        self.image_extension = image_extension
        self.metas: List[Tuple[str, str, int, List[int]]] = []

        if os.path.isfile(scan_list):
            with open(scan_list) as f:
                scans = [line.rstrip() for line in f.readlines()]
        else:
            scans = [""]

        light_indexes = (
            [str(i) for i in range(num_light_idx)] if num_light_idx > 0 else [""]
        )

        for scan in scans:
            pair_data = read_pair_file(os.path.join(data_path, scan, pair_path))
            for light_idx in light_indexes:
                self.metas += [(scan, light_idx, ref, src) for ref, src in pair_data]

    def __len__(self) -> int:
        return len(self.metas)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        scan, light_idx, ref_view, src_views = self.metas[idx]
        num_src_views = min(len(src_views), self.num_views)
        if self.robust_train:
            chosen = random.sample(range(len(src_views)), num_src_views)
            view_ids = [ref_view] + [src_views[i] for i in chosen]
        else:
            view_ids = [ref_view] + src_views[:num_src_views]

        images: List[np.ndarray] = []
        intrinsics: List[np.ndarray] = []
        extrinsics: List[np.ndarray] = []
        depth_min = -1.0
        depth_max = -1.0
        depth_gt = np.empty(0, np.float32)
        mask = np.empty(0, bool)
        ref_h = ref_w = 0

        for view_index, view_id in enumerate(view_ids):
            img_path = os.path.join(
                self.data_path,
                scan,
                self.image_folder,
                light_idx,
                "{:0>8}{}".format(view_id, self.image_extension),
            )
            image, orig_h, orig_w = read_image(img_path, self.max_dim)
            if image.ndim == 2:
                image = np.repeat(image[:, :, None], 3, axis=2)

            intrinsic, extrinsic, depth_params = read_cam_file(
                os.path.join(
                    self.data_path, scan, self.cam_folder, "{:0>8}_cam.txt".format(view_id)
                )
            )
            intrinsic = intrinsic.copy()
            intrinsic[0] *= image.shape[1] / orig_w
            intrinsic[1] *= image.shape[0] / orig_h

            if view_index == 0:
                ref_h, ref_w = image.shape[0], image.shape[1]
                depth_min = float(depth_params[0])
                depth_max = float(depth_params[1])
                gt_path = os.path.join(
                    self.data_path, scan, self.depth_folder, "{:0>8}.pfm".format(view_id)
                )
                if os.path.isfile(gt_path):
                    depth_gt = read_map(gt_path, self.max_dim)[:, :, 0].astype(np.float32)
                    mask = depth_gt >= depth_min
            elif image.shape[0] != ref_h or image.shape[1] != ref_w:
                # Normalize source views to the reference resolution so the
                # sample stacks into one static-shape array.
                intrinsic[0] *= ref_w / image.shape[1]
                intrinsic[1] *= ref_h / image.shape[0]
                image = resize_bilinear_np(image, ref_h, ref_w)

            images.append(image)
            intrinsics.append(intrinsic)
            extrinsics.append(extrinsic)

        return {
            "images": np.stack(images),  # [N, H, W, 3]
            "intrinsics": np.stack(intrinsics),  # [N, 3, 3]
            "extrinsics": np.stack(extrinsics),  # [N, 4, 4]
            "depth_min": np.float32(depth_min),
            "depth_max": np.float32(depth_max),
            "depth_gt": depth_gt,  # [H, W] or empty
            "mask": mask,  # [H, W] bool or empty
            "filename": os.path.join(scan, "{}", "{:0>8}".format(view_ids[0]) + "{}"),
        }

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for i in range(len(self)):
            yield self[i]


def _stack_batch(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    keys = samples[0].keys()
    for k in keys:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = list(vals)
        else:
            out[k] = np.stack(vals)
    return out


class BatchLoader:
    """Minimal multi-threaded batching loader (the torch DataLoader
    counterpart — reference: train.py:269-270 — without a torch dependency).

    Samples in a batch must share shapes (same dataset resolution). Images
    are adjusted to multiples of 8 (`adjust` flag) before stacking.
    """

    def __init__(
        self,
        dataset: MVSDataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        adjust: bool = True,
        num_threads: int = 4,
        prefetch: int = 2,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.adjust = adjust
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _load(self, idx: int) -> Dict[str, Any]:
        sample = self.dataset[idx]
        if self.adjust:
            sample = adjust_sample_dims(sample)
        return sample

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            self.rng.shuffle(order)

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_threads <= 1:
            for b in batches:
                yield _stack_batch([self._load(i) for i in b])
            return

        # Pool of num_threads workers loading SAMPLES concurrently (each
        # sample = N image decodes + resizes; PIL/numpy release the GIL),
        # with up to `prefetch` whole batches in flight ahead of the
        # consumer. Batch order is preserved.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            window = max(1, self.prefetch)
            pending: "deque" = deque()
            bi = 0
            while bi < len(batches) or pending:
                while bi < len(batches) and len(pending) < window:
                    pending.append(
                        [pool.submit(self._load, i) for i in batches[bi]]
                    )
                    bi += 1
                futures = pending.popleft()
                yield _stack_batch([f.result() for f in futures])
