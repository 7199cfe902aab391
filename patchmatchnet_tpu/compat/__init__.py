"""Interop with the PyTorch reference: checkpoint conversion and persistence."""

from patchmatchnet_tpu.compat.torch_convert import (
    convert_torch_checkpoint,
    convert_torch_state_dict,
    load_variables,
    save_variables,
)

__all__ = [
    "convert_torch_checkpoint",
    "convert_torch_state_dict",
    "load_variables",
    "save_variables",
]
