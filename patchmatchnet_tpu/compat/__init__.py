"""Interop with the PyTorch reference: checkpoint conversion and persistence."""

from patchmatchnet_tpu.compat.export import export_inference, load_exported
from patchmatchnet_tpu.compat.torch_convert import (
    convert_torch_checkpoint,
    convert_torch_state_dict,
    load_variables,
    save_variables,
)

__all__ = [
    "export_inference",
    "load_exported",
    "convert_torch_checkpoint",
    "convert_torch_state_dict",
    "load_variables",
    "save_variables",
]
