"""Typed configuration shared by the train/eval/fuse CLIs.

One dataclass instead of the reference's three argparse CLIs duplicating the
same six model flags (reference: train.py:222-233, eval.py:326-337,
train_dtu.py:44-55). Serialized as JSON next to checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Tuple


@dataclass
class ModelConfig:
    patchmatch_interval_scale: Tuple[float, ...] = (0.005, 0.0125, 0.025)
    propagation_range: Tuple[int, ...] = (6, 4, 2)
    patchmatch_iteration: Tuple[int, ...] = (1, 2, 2)
    patchmatch_num_sample: Tuple[int, ...] = (8, 8, 16)
    propagate_neighbors: Tuple[int, ...] = (0, 8, 16)
    evaluate_neighbors: Tuple[int, ...] = (9, 9, 9)
    # "bf16": bfloat16 feature/gather payloads with f32 weights and
    # accumulation (inference default; median depth delta vs f32 measured at
    # ~0.03% of depth — PROGRESS.md precision table). "f32": full precision,
    # bit-close to the PyTorch reference.
    precision: str = "bf16"
    # Training precision. "bf16" = mixed precision: bf16 feature/warp
    # payloads, f32 parameters, BatchNorm statistics, loss and optimizer
    # state, with the windowed sampler + its custom-VJP backward on the
    # warp path (measured 3.72 vs 2.67 samples/s at the DTU config; loss
    # trajectories match f32 — PROGRESS.md round-4 training table). "f32"
    # reproduces the reference trainer exactly (reference: train.py is
    # full-f32 torch).
    train_precision: str = "bf16"


@dataclass
class DataConfig:
    input_folder: str = ""
    dataset: str = "unified"  # "unified" (cams/pair layout) or "dtu_legacy"
    num_views: int = 5
    image_max_dim: int = -1
    scan_list: str = ""
    num_light_idx: int = -1
    image_extension: str = ".jpg"
    batch_size: int = 1


@dataclass
class TrainConfig:
    output_folder: str = ""
    checkpoint_path: str = ""
    resume: bool = False
    epochs: int = 16
    learning_rate: float = 1e-3
    lr_epochs: str = "10,12,14:2"
    weight_decay: float = 0.0
    summary_freq: int = 20
    save_freq: int = 1
    rand_seed: int = 1
    robust_train: bool = False
    train_list: str = ""
    test_list: str = ""
    # "msgpack" (portable single-file default) or "orbax" (atomic directory
    # commits, restores onto sharded array trees)
    ckpt_backend: str = "msgpack"


@dataclass
class FuseConfig:
    geo_pixel_thres: float = 1.0
    geo_depth_thres: float = 0.01
    geo_mask_thres: int = 5
    photo_thres: float = 0.5
    file_format: str = ".pfm"


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    fuse: FuseConfig = field(default_factory=FuseConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)

        def mk(cls, d):
            fields = {f.name for f in dataclasses.fields(cls)}
            kwargs = {k: v for k, v in d.items() if k in fields}
            for k, v in kwargs.items():
                if isinstance(v, list):
                    kwargs[k] = tuple(v) if cls is ModelConfig else v
            return cls(**kwargs)

        return Config(
            model=mk(ModelConfig, raw.get("model", {})),
            data=mk(DataConfig, raw.get("data", {})),
            train=mk(TrainConfig, raw.get("train", {})),
            fuse=mk(FuseConfig, raw.get("fuse", {})),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @staticmethod
    def load(path: str) -> "Config":
        with open(path) as f:
            return Config.from_json(f.read())
