"""PFM (portable float map) codec.

Format-compatible with the maps written/read by the reference implementation
(reference: datasets/data_io.py:226-302): `Pf` header for single-channel,
`PF` for 3-channel, negative scale for little-endian, rows stored bottom-up.
"""

from __future__ import annotations

import sys
from typing import Tuple

import numpy as np


def read_pfm(filename: str) -> Tuple[np.ndarray, float]:
    """Read a PFM file.

    Returns:
        (data, scale): data has shape (H, W, C) with C in {1, 3}; scale is the
        stored magnitude of the scale field.
    """
    with open(filename, "rb") as f:
        header = f.readline().decode("utf-8").rstrip()
        if header == "PF":
            channels = 3
        elif header == "Pf":
            channels = 1
        else:
            raise ValueError(f"Not a PFM file: {filename!r} (header {header!r})")

        dims = f.readline().decode("utf-8").split()
        if len(dims) != 2:
            raise ValueError(f"Malformed PFM header in {filename!r}")
        width, height = int(dims[0]), int(dims[1])

        scale = float(f.readline().decode("utf-8").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)

        data = np.fromfile(f, dtype=endian + "f")

    if data.size != width * height * channels:
        raise ValueError(
            f"PFM payload size mismatch in {filename!r}: "
            f"expected {width * height * channels}, got {data.size}"
        )
    data = data.reshape(height, width, channels)
    # PFM stores rows bottom-to-top.
    return np.flipud(data).copy(), scale


def save_pfm(filename: str, image: np.ndarray, scale: float = 1.0) -> None:
    """Write a PFM file. `image` must be float32, (H, W), (H, W, 1) or (H, W, 3)."""
    if image.dtype.name != "float32":
        raise ValueError("PFM image dtype must be float32")

    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
    else:
        raise ValueError("PFM image must be HxW, HxWx1 or HxWx3")

    data = np.flipud(image)
    little = image.dtype.byteorder == "<" or (
        image.dtype.byteorder == "=" and sys.byteorder == "little"
    )

    with open(filename, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode("utf-8"))
        f.write((f"{-scale if little else scale:f}\n").encode("utf-8"))
        data.tofile(f)
