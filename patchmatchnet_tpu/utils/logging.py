"""Scalar/image logging: TensorBoard when available, JSONL fallback.

Counterpart of the reference's SummaryWriter usage (reference: utils.py:94-138).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict

import numpy as np


class MetricsLogger:
    """Writes scalars (and optionally images) to TensorBoard and/or JSONL."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True) -> None:
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalars(self, mode: str, scalar_dict: Dict[str, Any], step: int) -> None:
        record = {"mode": mode, "step": step, "time": time.time()}
        for key, value in scalar_dict.items():
            value = float(value)
            record[key] = value
            if self._tb is not None:
                self._tb.add_scalar(f"{mode}/{key}", value, step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def image(self, mode: str, name: str, image: np.ndarray, step: int) -> None:
        """image: [H, W] or [H, W, C] float; normalized per-image."""
        if self._tb is None:
            return
        img = np.asarray(image, dtype=np.float32)
        lo, hi = float(img.min()), float(img.max())
        if hi > lo:
            img = (img - lo) / (hi - lo)
        if img.ndim == 2:
            img = img[None]
        else:
            img = img.transpose(2, 0, 1)
        self._tb.add_image(f"{mode}/{name}", img, step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()
