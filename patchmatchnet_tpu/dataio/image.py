"""Image reading/writing and host-side resizing.

Mirrors the behavior of the reference image codec (reference:
datasets/data_io.py:13-82): images load as float32 in [0, 1], `scale_to_max_dim`
shrinks (never grows) so the longest side fits `max_dim`, using bilinear
interpolation with half-pixel centers (cv2.INTER_LINEAR convention).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from PIL import Image

try:  # cv2 is present in this environment; fall back to numpy if not
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from patchmatchnet_tpu import native as _native


def resize_bilinear_np(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear resize with half-pixel centers (cv2.INTER_LINEAR / torch
    align_corners=False convention), pure numpy. `image` is (H, W) or (H, W, C)."""
    in_h, in_w = image.shape[:2]
    if (in_h, in_w) == (height, width):
        return image
    squeeze = image.ndim == 2
    if squeeze:
        image = image[:, :, None]

    scale_y = in_h / height
    scale_x = in_w / width
    yy = (np.arange(height, dtype=np.float64) + 0.5) * scale_y - 0.5
    xx = (np.arange(width, dtype=np.float64) + 0.5) * scale_x - 0.5
    yy = np.clip(yy, 0.0, in_h - 1.0)
    xx = np.clip(xx, 0.0, in_w - 1.0)
    y0 = np.floor(yy).astype(np.int64)
    x0 = np.floor(xx).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (yy - y0).astype(image.dtype if image.dtype.kind == "f" else np.float32)
    wx = (xx - x0).astype(wy.dtype)

    img = image.astype(wy.dtype, copy=False)
    top = img[y0][:, x0] * (1 - wx)[None, :, None] + img[y0][:, x1] * wx[None, :, None]
    bot = img[y1][:, x0] * (1 - wx)[None, :, None] + img[y1][:, x1] * wx[None, :, None]
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    out = out.astype(image.dtype, copy=False)
    return out[:, :, 0] if squeeze else out


def _resize(image: np.ndarray, height: int, width: int) -> np.ndarray:
    # native C++ path: exact float bilinear (cv2 uses 5-bit fixed point)
    if image.dtype == np.float32:
        out = _native.resize_bilinear(image, height, width)
        if out is not None:
            return out
    if _HAS_CV2 and image.dtype in (np.float32, np.uint8):
        return cv2.resize(image, (width, height), interpolation=cv2.INTER_LINEAR)
    return resize_bilinear_np(image, height, width)


def scale_to_max_dim(image: np.ndarray, max_dim: int) -> Tuple[np.ndarray, int, int]:
    """Shrink image so max(H, W) <= max_dim (no-op if already smaller or max_dim <= 0).

    Returns (image, original_height, original_width).
    """
    original_height, original_width = image.shape[0], image.shape[1]
    scale = max_dim / max(original_height, original_width)
    if 0 < scale < 1:
        width = int(scale * original_width)
        height = int(scale * original_height)
        had_channels = image.ndim == 3
        image = _resize(image, height, width)
        if had_channels and image.ndim == 2:  # cv2 squeezes (H, W, 1)
            image = image[:, :, None]
    return image, original_height, original_width


def scaled_dims(height: int, width: int, max_dim: int) -> Tuple[int, int]:
    """The (H, W) that scale_to_max_dim would produce, without any decode."""
    scale = max_dim / max(height, width) if max_dim > 0 else 1.0
    if 0 < scale < 1:
        return int(scale * height), int(scale * width)
    return height, width


def read_image_size(filename: str) -> Tuple[int, int]:
    """Image (height, width) from the file header — no pixel decode."""
    with Image.open(filename) as im:
        w, h = im.size
    return h, w


def read_image(filename: str, max_dim: int = -1) -> Tuple[np.ndarray, int, int]:
    """Read image as float32 in [0, 1], optionally shrunk to `max_dim`.

    Returns (image[H, W, C], original_height, original_width).
    """
    image = Image.open(filename)
    raw = np.asarray(image)
    if raw.dtype == np.uint8:
        np_image = _native.u8_to_f32(raw)
        if np_image is None:
            np_image = raw.astype(np.float32) / 255.0
    else:
        np_image = np.asarray(image, dtype=np.float32) / 255.0
    return scale_to_max_dim(np_image, max_dim)


def save_image(filename: str, image: np.ndarray) -> None:
    """Save an image; bool masks become 0/255, floats are assumed in [0, 1]."""
    if image.dtype == bool:
        image = image.astype(np.uint8) * 255
    elif image.dtype in (np.float32, np.float64):
        image = (image * 255).astype(np.uint8)
    else:
        image = image.astype(np.uint8)
    Image.fromarray(image).save(filename)


def read_image_dictionary(filename: str) -> Dict[int, str]:
    """Read an `index -> image filename` dictionary file (ETH3D tooling)."""
    image_dict: Dict[int, str] = {}
    with open(filename) as f:
        num_entries = int(f.readline().strip())
        for _ in range(num_entries):
            parts = f.readline().strip().split(" ")
            image_dict[int(parts[0].strip())] = parts[1].strip()
    return image_dict
