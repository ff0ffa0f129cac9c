"""Precomputed text embeddings (the framework ships no text encoder, same as
the reference: pos_emb.pt / neg_emb.pt, txt_in_dim=5120; loaded at
src/core/generation_utils.py:512-553)."""

import os
from typing import Dict, Optional

import numpy as np

POS_LEN, NEG_LEN, TXT_DIM = 58, 64, 5120


def _load_one(path: str) -> np.ndarray:
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=True)
        return t.float().numpy()
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="numpy") as f:
            key = list(f.keys())[0]
            return np.asarray(f.get_tensor(key), dtype=np.float32)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    raise ValueError(f"unsupported embedding format: {path}")


_NAMES = {"pos": ("pos_emb.pt", "pos_emb.safetensors", "pos_emb.npy"),
          "neg": ("neg_emb.pt", "neg_emb.safetensors", "neg_emb.npy")}


def find_embedding_path(kind: str, search_dirs) -> Optional[str]:
    """The exact file load_text_embeddings would serve for `kind`
    ("pos"/"neg"), or None. Shared with the --doctor report so the
    diagnosis matches the loader's search order."""
    for d in search_dirs:
        if not d or not os.path.isdir(d):
            continue
        for c in _NAMES[kind]:
            p = os.path.join(d, c)
            if os.path.isfile(p):
                return p
    return None


def load_text_embeddings(search_dirs, debug=None,
                         txt_dim: int = TXT_DIM) -> Dict[str, np.ndarray]:
    """Find pos_emb/neg_emb in the given directories (model_dir, cwd, ...).

    Falls back to zero embeddings with a warning if none are found (enough for
    benchmarking; real runs should provide the files next to the weights).
    `txt_dim` is the serving model's text width (DiTConfig.txt_in_dim — 5120
    for the published 3B/7B, but config-sniffed checkpoints can differ): the
    zero fallback is sized to it, and a loaded file that doesn't match it
    fails here with a clear message instead of as a shape error mid-DiT."""
    out: Dict[str, Optional[np.ndarray]] = {"pos": None, "neg": None}
    for kind in out:
        p = find_embedding_path(kind, search_dirs)
        if p is not None:
            emb = _load_one(p)
            if emb.shape[-1] != txt_dim:
                raise ValueError(
                    f"{p}: text embedding dim {emb.shape[-1]} does "
                    f"not match the model's txt_in_dim {txt_dim}")
            out[kind] = emb
    if out["pos"] is None:
        if debug:
            debug.log("text embeddings not found; using zeros",
                      level="WARNING", category="setup", force=True)
        out["pos"] = np.zeros((POS_LEN, txt_dim), np.float32)
    if out["neg"] is None:
        out["neg"] = np.zeros((NEG_LEN, txt_dim), np.float32)
    return {"pos": out["pos"], "neg": out["neg"]}
