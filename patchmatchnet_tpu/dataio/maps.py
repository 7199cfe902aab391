"""Depth/confidence map reading with format dispatch by extension (.pfm / .bin)."""

from __future__ import annotations

import numpy as np

from patchmatchnet_tpu.dataio.colmap_bin import read_bin, save_bin
from patchmatchnet_tpu.dataio.image import scale_to_max_dim
from patchmatchnet_tpu.dataio.pfm import read_pfm, save_pfm


def read_map(path: str, max_dim: int = -1) -> np.ndarray:
    """Read a PFM or COLMAP-bin map, optionally shrunk so max(H, W) <= max_dim."""
    if path.endswith(".bin"):
        in_map = read_bin(path)
    elif path.endswith(".pfm"):
        in_map, _ = read_pfm(path)
    else:
        raise ValueError("Invalid map format; only .pfm and .bin are supported")
    return scale_to_max_dim(in_map, max_dim)[0]


def save_map(path: str, data: np.ndarray) -> None:
    """Write a PFM or COLMAP-bin map, dispatched by extension."""
    if path.endswith(".bin"):
        save_bin(path, data)
    elif path.endswith(".pfm"):
        save_pfm(path, data)
    else:
        raise ValueError("Invalid map format; only .pfm and .bin are supported")
