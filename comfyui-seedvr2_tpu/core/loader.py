"""Weight loading: reference checkpoints -> JAX parameter pytrees.

The parameter tree intentionally mirrors the reference checkpoint key
structure (src/core/model_loader.py:84-155 loads safetensors/.pth/.gguf with
these names), so conversion is purely mechanical:
 - Linear `weight` (2D) -> "w", transposed to (in, out) for x @ w.
 - Conv3d `weight` (5D, (out, in, kt, kh, kw)) -> "w", transposed to
   (kt, kh, kw, in, out) for NDHWC lax.conv_general_dilated.
 - `bias` -> "b".
 - 1D norm / modulation parameters keep their names.
 - RoPE frequency buffers ("*.rope.freqs", "*.dummy") are dropped — they are
   recomputed at plan time (models/dit/rope.py).

Unlike the reference there is no meta-device dance: arrays are read directly
into host numpy and transferred to HBM (optionally sharded) in one hop.
"""

import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

_SKIP_PATTERNS = (
    re.compile(r"\.rope\."),
    re.compile(r"\.freqs$"),
    re.compile(r"\.dummy$"),
)

# fp8 weights are storage-only: upcast at load (TPU matmuls run bf16).
_TORCH_DTYPE_UPCAST = {"float8_e4m3fn", "float8_e5m2"}


def _should_skip(key: str) -> bool:
    return any(p.search(key) for p in _SKIP_PATTERNS)


def _assign(tree: dict, parts, value):
    node = tree
    for p in parts[:-1]:
        if isinstance(node, list):
            node = node[int(p)]
        else:
            node = node.setdefault(p, {})
    leaf = parts[-1]
    if isinstance(node, list):
        node[int(leaf)] = value
    else:
        node[leaf] = value


def _listify_blocks(tree: dict) -> dict:
    """Convert {'blocks': {'0': {...}, '1': {...}}} into an ordered list."""
    if "blocks" in tree and isinstance(tree["blocks"], dict):
        blocks = tree["blocks"]
        tree["blocks"] = [blocks[str(i)] for i in range(len(blocks))]
    return tree


def convert_state_dict(
    state: Dict[str, np.ndarray],
    dtype=jnp.bfloat16,
    conv_keys: Optional[re.Pattern] = None,
) -> dict:
    """Convert a torch-layout state dict (numpy arrays) to our param tree.

    Args:
        state: flat {torch_key: np.ndarray}.
        dtype: target storage dtype for floating-point weights.
        conv_keys: regex matching keys whose 5D/4D weights are convolutions
            (needed to distinguish conv weights from linear weights).
    """
    tree: dict = {}
    for key, val in state.items():
        if _should_skip(key):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if isinstance(val, dict) and "q8" in val:
            # quantized linear weight: merge {"q8","scales"} into the module
            # node (consumed by ops/layers.linear via the fused kernel)
            _assign(tree, parts[:-1] + ["q8"], jnp.asarray(val["q8"]))
            _assign(tree, parts[:-1] + ["scales"], jnp.asarray(val["scales"]))
            continue
        arr = np.asarray(val)
        if leaf == "weight":
            if arr.ndim == 2:
                parts[-1] = "w"
                arr = np.ascontiguousarray(arr.T)
            elif arr.ndim == 5:
                parts[-1] = "w"
                arr = np.ascontiguousarray(arr.transpose(2, 3, 4, 1, 0))
            elif arr.ndim == 4:
                parts[-1] = "w"
                arr = np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
            # 1D norm weights keep name "weight"
        elif leaf == "bias":
            parts[-1] = "b"
        if np.issubdtype(arr.dtype, np.floating) or arr.dtype.name in (
            "bfloat16", "float8_e4m3fn", "float8_e5m2"
        ):
            arr = jnp.asarray(arr).astype(dtype)
        else:
            arr = jnp.asarray(arr)
        _assign(tree, parts, arr)
    return _listify_blocks(tree)


def load_safetensors(path: str, dtype=jnp.bfloat16) -> dict:
    """Load a safetensors checkpoint into the param tree (host -> HBM)."""
    from safetensors import safe_open

    state = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            if _should_skip(key):
                continue
            state[key] = f.get_tensor(key)
    return convert_state_dict(state, dtype=dtype)


def torch_module_to_params(module, dtype=jnp.float32) -> dict:
    """Test helper: convert a live torch module's state_dict (used by the
    golden-parity oracle tests)."""
    state = {}
    for k, v in module.state_dict().items():
        t = v.detach().cpu()
        if t.dtype.is_floating_point:
            t = t.float()
        state[k] = t.numpy()
    return convert_state_dict(state, dtype=dtype)
