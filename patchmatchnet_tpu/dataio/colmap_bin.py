"""COLMAP .bin depth/normal map codec.

Compatible with COLMAP's dense map format: an ASCII `W&H&C&` header followed
by float32 data in Fortran (column-major) order. Mirrors the behavior of the
reference codec (reference: datasets/data_io.py:165-223).
"""

from __future__ import annotations

import numpy as np


def read_bin(path: str) -> np.ndarray:
    """Read a COLMAP .bin map. Returns array of shape (H, W, C)."""
    with open(path, "rb") as f:
        # Header is "W&H&C&" in ASCII.
        header = b""
        delims = 0
        while delims < 3:
            byte = f.read(1)
            if not byte:
                raise ValueError(f"Truncated COLMAP bin header in {path!r}")
            header += byte
            if byte == b"&":
                delims += 1
        fields = header.decode("ascii").split("&")[:3]
        width, height, channels = (int(x) for x in fields)
        data = np.fromfile(f, np.float32)

    if data.size != width * height * channels:
        raise ValueError(
            f"COLMAP bin payload size mismatch in {path!r}: "
            f"expected {width * height * channels}, got {data.size}"
        )
    data = data.reshape((width, height, channels), order="F")
    return np.transpose(data, (1, 0, 2)).copy()


def save_bin(filename: str, data: np.ndarray) -> None:
    """Write a COLMAP .bin map. `data` must be float32, (H, W) or (H, W, C<=3)."""
    if data.dtype != np.float32:
        raise ValueError("COLMAP bin data dtype must be float32")

    if data.ndim == 2:
        height, width = data.shape
        channels = 1
        data = data[:, :, None]
    elif data.ndim == 3 and data.shape[2] in (1, 3):
        height, width, channels = data.shape
    else:
        raise ValueError("Map must have HxW, HxWx1 or HxWx3 dimensions")

    with open(filename, "wb") as f:
        f.write(f"{width}&{height}&{channels}&".encode("ascii"))
        # Fortran order over (W, H, C) axes == transpose then F-ravel.
        np.ascontiguousarray(
            np.transpose(data, (1, 0, 2)).reshape(-1, order="F"), dtype="<f4"
        ).tofile(f)
