"""Lossless torch -> JAX checkpoint conversion for PatchmatchNet weights.

Maps the reference state dict (e.g. checkpoints/params_000007.ckpt, keys
prefixed `module.` by DataParallel — reference: train.py:47, SURVEY §5.4)
onto this package's flax variable tree, including BatchNorm running stats
(inference uses them).

Layout transforms:
- Conv2d weight [O, I, kH, kW]        -> HWIO kernel [kH, kW, I, O]
- 1x1 Conv2d / 1x1x1 Conv3d weight    -> Dense kernel [I, O]
- ConvTranspose2d weight [I, O, kH, kW] -> forward-conv HWIO kernel,
  spatially flipped (see models.layers.ConvTranspose2dTorch)
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, List, Tuple

import numpy as np

# Torch keys that have no flax counterpart because the module is never called:
# stage 1 has no propagation (the reference defines the conv anyway for
# TorchScript export — reference: patchmatch.py:286-298), and the pixel-wise
# view-weight net only ever runs on stage 3 (weights are reused downstream —
# reference: patchmatch.py:205-211, net.py:236-267).
_EXPECTED_UNUSED_PREFIXES = (
    "patchmatch_1.propa_conv",
    "patchmatch_1.evaluation.pixel_wise_net",
    "patchmatch_2.evaluation.pixel_wise_net",
)


def _to_np(tensor) -> np.ndarray:
    return np.asarray(tensor.detach().cpu().numpy(), dtype=np.float32)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    # [O, I, 1, 1] or [O, I, 1, 1, 1] or [O, I] -> [I, O]
    return np.transpose(w.reshape(w.shape[0], w.shape[1]), (1, 0))


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    # [I, O, kH, kW] -> flipped HWIO [kH, kW, I, O]
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference state dict to {'params': ..., 'batch_stats': ...}.

    Accepts torch tensors or numpy arrays as values; `module.` prefixes are
    stripped.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    skipped: List[str] = []

    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith(_EXPECTED_UNUSED_PREFIXES):
            skipped.append(key)
            continue

        w = value if isinstance(value, np.ndarray) else _to_np(value)
        # feature_weight_net lives under Evaluation in this framework (its
        # neighbor sampling is fused into the evaluation gather)
        key = key.replace(".feature_weight_net.", ".evaluation.feature_weight_net.")
        parts = key.split(".")
        leaf = parts[-1]
        scope = parts[:-1]

        # --- BatchNorm ---
        if len(scope) >= 1 and scope[-1] == "bn":
            if leaf == "weight":
                _set(params, (*scope, "scale"), w)
            elif leaf == "bias":
                _set(params, (*scope, "bias"), w)
            elif leaf == "running_mean":
                _set(stats, (*scope, "mean"), w)
            elif leaf == "running_var":
                _set(stats, (*scope, "var"), w)
            else:
                raise ValueError(f"Unhandled BN key: {key}")
            continue

        # --- ConvTranspose (Refinement.deconv) ---
        if scope and scope[-1] == "deconv":
            if leaf != "weight":
                raise ValueError(f"Unexpected deconv key: {key}")
            _set(params, (*scope, "kernel"), _deconv_kernel(w))
            continue

        # --- learned-offset convs keep torch Conv2d layout ---
        if scope and scope[-1] in ("propa_conv", "eval_conv"):
            if leaf == "weight":
                _set(params, (*scope, "conv2d", "kernel"), _conv2d_kernel(w))
            else:
                _set(params, (*scope, "conv2d", "bias"), w)
            continue

        # --- Dense1 blocks (1x1x1 conv3d with bias) ---
        if scope and scope[-1] in ("conv2", "similarity") and "net" in ".".join(scope):
            if leaf == "weight":
                _set(params, (*scope, "dense", "kernel"), _dense_kernel(w))
            else:
                _set(params, (*scope, "dense", "bias"), w)
            continue

        if leaf == "weight":
            if w.ndim == 5 or (w.ndim == 4 and w.shape[2] == w.shape[3] == 1):
                # 1x1 conv (FeatureNet laterals) or 1x1x1 conv3d -> Dense
                _set(params, (*scope, "kernel"), _dense_kernel(w))
            elif w.ndim == 4:
                # regular conv inside ConvBnReLU ('conv') or Refinement 'res'
                _set(params, (*scope, "kernel"), _conv2d_kernel(w))
            else:
                raise ValueError(f"Unhandled weight shape {w.shape} for {key}")
        elif leaf == "bias":
            _set(params, (*scope, "bias"), w)
        else:
            raise ValueError(f"Unhandled key: {key}")

    # The DenseBnReLU blocks nest their Dense under 'conv'; torch nests the
    # Conv3d under 'conv' too, so paths already line up. Same for ConvBnReLU.
    return {"params": params, "batch_stats": stats}


def convert_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference `params_*.ckpt` (torch.save dict with 'model') and
    convert. Requires torch (CPU) to unpickle."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt["model"] if "model" in ckpt else ckpt
    return convert_torch_state_dict(state_dict)


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    """Persist a variable tree (params + batch_stats) as msgpack."""
    from flax import serialization

    import jax

    as_np = jax.tree.map(lambda x: np.asarray(x), variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(as_np))


def load_variables(path: str) -> Dict[str, Any]:
    """Load a variable tree saved by `save_variables`."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
