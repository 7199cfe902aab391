"""Camera (`*_cam.txt`) and view-pair (`pair.txt`) text codecs.

File formats match the MVSNet/PatchmatchNet convention (reference:
datasets/data_io.py:85-127 and README.md:59-83):

cam.txt::

    extrinsic
    E00 E01 E02 E03
    ...4 rows...

    intrinsic
    K00 K01 K02
    ...3 rows...

    DEPTH_MIN DEPTH_MAX

pair.txt::

    NUM_VIEWS
    REF_ID0
    NUM_SRC SRC_ID0 SCORE0 SRC_ID1 SCORE1 ...
    ...
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def read_cam_file(filename: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Read intrinsics (3x3), extrinsics (4x4) and depth params (min, max or empty)."""
    with open(filename) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extrinsics = np.fromstring(" ".join(lines[1:5]), dtype=np.float32, sep=" ").reshape(4, 4)
    intrinsics = np.fromstring(" ".join(lines[7:10]), dtype=np.float32, sep=" ").reshape(3, 3)
    if len(lines) >= 12:
        depth_params = np.fromstring(lines[11], dtype=np.float32, sep=" ")
    else:
        depth_params = np.empty(0, dtype=np.float32)
    return intrinsics, extrinsics, depth_params


def save_cam_file(
    filename: str,
    intrinsics: np.ndarray,
    extrinsics: np.ndarray,
    depth_params: Optional[Sequence[float]] = None,
) -> None:
    """Write a cam.txt file in MVSNet layout."""
    lines = ["extrinsic"]
    for row in np.asarray(extrinsics, dtype=np.float64).reshape(4, 4):
        lines.append(" ".join(repr(float(v)) for v in row))
    lines.append("")
    lines.append("intrinsic")
    for row in np.asarray(intrinsics, dtype=np.float64).reshape(3, 3):
        lines.append(" ".join(repr(float(v)) for v in row))
    lines.append("")
    if depth_params is not None and len(depth_params) > 0:
        lines.append(" ".join(repr(float(v)) for v in depth_params))
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_pair_file(filename: str) -> List[Tuple[int, List[int]]]:
    """Read view-selection pairs: list of (ref_id, [src_ids]) with src scores dropped.

    Reference views with zero source views are skipped.
    """
    data: List[Tuple[int, List[int]]] = []
    with open(filename) as f:
        num_viewpoint = int(f.readline())
        for _ in range(num_viewpoint):
            ref_view = int(f.readline().rstrip())
            src_views = [int(x) for x in f.readline().rstrip().split()[1::2]]
            if src_views:
                data.append((ref_view, src_views))
    return data


def save_pair_file(
    filename: str, pairs: Sequence[Tuple[int, Sequence[Tuple[int, float]]]]
) -> None:
    """Write pair.txt; `pairs` is a list of (ref_id, [(src_id, score), ...])."""
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as f:
        f.write(f"{len(pairs)}\n")
        for ref_id, srcs in pairs:
            f.write(f"{ref_id}\n")
            entries = " ".join(f"{sid} {score}" for sid, score in srcs)
            f.write(f"{len(srcs)} {entries}\n" if srcs else f"{len(srcs)}\n")
