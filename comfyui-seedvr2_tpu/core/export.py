"""Checkpoint export: JAX param pytrees -> reference-layout safetensors.

Inverse of core/loader.py: "w" -> "weight" (transposed back to torch layout:
(in,out)->(out,in) for linears, (kt,kh,kw,ci,co)->(co,ci,kt,kh,kw) for
convs), "b" -> "bias". Output files load in both this framework and the
PyTorch reference — used for interop, fine-tune checkpointing (parallel/
train.py), and test fixtures."""

from typing import Dict

import numpy as np


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def to_torch_state_dict(params: dict, dtype=np.float16) -> Dict[str, np.ndarray]:
    state = {}
    for key, val in _flatten(params).items():
        parts = key.split(".")
        leaf = parts[-1]
        arr = np.asarray(val)
        if arr.dtype.name == "bfloat16":
            arr = arr.astype(np.float32)
        if leaf == "w":
            parts[-1] = "weight"
            if arr.ndim == 2:
                arr = np.ascontiguousarray(arr.T)
            elif arr.ndim == 5:
                arr = np.ascontiguousarray(arr.transpose(4, 3, 0, 1, 2))
            elif arr.ndim == 4:
                arr = np.ascontiguousarray(arr.transpose(3, 2, 0, 1))
        elif leaf == "b":
            parts[-1] = "bias"
        if np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(dtype)
        state[".".join(parts)] = arr
    return state


def save_checkpoint(params: dict, path: str, dtype=np.float16):
    from safetensors.numpy import save_file

    save_file(to_torch_state_dict(params, dtype), path)
