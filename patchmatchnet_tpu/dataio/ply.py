"""Binary PLY point-cloud writer/reader (no third-party `plyfile` dependency).

Writes the same element layout the reference produces via plyfile
(reference: eval.py:283-297): a single `vertex` element with float32 x/y/z and
uint8 red/green/blue, binary little-endian.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_VERTEX_DTYPE = np.dtype(
    [
        ("x", "<f4"),
        ("y", "<f4"),
        ("z", "<f4"),
        ("red", "u1"),
        ("green", "u1"),
        ("blue", "u1"),
    ]
)


def save_ply(filename: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Write a colored point cloud.

    Args:
        filename: output .ply path
        xyz: (N, 3) float array of world coordinates
        rgb: (N, 3) uint8 array of colors
    """
    xyz = np.asarray(xyz)
    rgb = np.asarray(rgb)
    if xyz.ndim != 2 or xyz.shape[1] != 3:
        raise ValueError("xyz must be (N, 3)")
    if rgb.shape != xyz.shape:
        raise ValueError("rgb must match xyz shape")

    n = xyz.shape[0]
    vertices = np.empty(n, dtype=_VERTEX_DTYPE)
    vertices["x"] = xyz[:, 0].astype(np.float32)
    vertices["y"] = xyz[:, 1].astype(np.float32)
    vertices["z"] = xyz[:, 2].astype(np.float32)
    vertices["red"] = rgb[:, 0].astype(np.uint8)
    vertices["green"] = rgb[:, 1].astype(np.uint8)
    vertices["blue"] = rgb[:, 2].astype(np.uint8)

    header = "\n".join(
        [
            "ply",
            "format binary_little_endian 1.0",
            f"element vertex {n}",
            "property float x",
            "property float y",
            "property float z",
            "property uchar red",
            "property uchar green",
            "property uchar blue",
            "end_header",
        ]
    )
    dirname = os.path.dirname(os.path.abspath(filename))
    os.makedirs(dirname, exist_ok=True)
    with open(filename, "wb") as f:
        f.write(header.encode("ascii") + b"\n")
        vertices.tofile(f)


def read_ply(filename: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a binary-little-endian PLY with x/y/z[/rgb] vertex properties.

    Returns (xyz[N, 3] float32, rgb[N, 3] uint8 — zeros if no color).
    Supports the layout written by `save_ply` plus simple variants.
    """
    with open(filename, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"Not a PLY file: {filename!r}")
        fmt = f.readline().strip()
        if b"binary_little_endian" not in fmt:
            raise ValueError("Only binary little-endian PLY is supported")

        n = 0
        props = []
        _TYPES = {
            b"float": "<f4",
            b"float32": "<f4",
            b"double": "<f8",
            b"uchar": "u1",
            b"uint8": "u1",
            b"int": "<i4",
            b"int32": "<i4",
        }
        while True:
            line = f.readline()
            if not line:
                raise ValueError("Unexpected EOF in PLY header")
            parts = line.strip().split()
            if parts[0] == b"end_header":
                break
            if parts[0] == b"comment":
                continue
            if parts[0] == b"element":
                if parts[1] != b"vertex":
                    raise ValueError("Only vertex-only PLY files are supported")
                n = int(parts[2])
            elif parts[0] == b"property":
                props.append((parts[2].decode("ascii"), _TYPES[parts[1]]))

        data = np.fromfile(f, dtype=np.dtype(props), count=n)

    xyz = np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float32)
    if "red" in data.dtype.names:
        rgb = np.stack([data["red"], data["green"], data["blue"]], axis=1).astype(np.uint8)
    else:
        rgb = np.zeros((n, 3), dtype=np.uint8)
    return xyz, rgb
