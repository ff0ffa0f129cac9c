"""Precomputed text embeddings (the framework ships no text encoder, same as
the reference: pos_emb.pt / neg_emb.pt, txt_in_dim=5120; loaded at
src/core/generation_utils.py:512-553).

Unlike the reference (which requires the user to download the .pt files next
to the weights), the published embeddings ship WITH this package as bf16
safetensors under assets/ — a default run of a published 3B/7B model always
gets real conditioning. User-provided files in the search dirs still win.
"""

import os
from typing import Dict, Optional

import numpy as np

POS_LEN, NEG_LEN, TXT_DIM = 58, 64, 5120

# Packaged copies of the published embeddings (bit-exact bf16 conversions of
# the reference repo's pos_emb.pt/neg_emb.pt; see tools/convert shipped via
# --convert_embeddings). Last-resort fallback after the user search dirs.
ASSETS_DIR = os.path.normpath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "assets"))


def _load_one(path: str) -> np.ndarray:
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=True)
        return t.float().numpy()
    if path.endswith(".safetensors"):
        try:
            from safetensors import safe_open

            with safe_open(path, framework="numpy") as f:
                key = list(f.keys())[0]
                return np.asarray(f.get_tensor(key), dtype=np.float32)
        except (TypeError, ValueError, AttributeError):
            # bf16 tensors (the packaged assets) aren't representable in
            # numpy's dtype system — route through torch. AttributeError:
            # some safetensors versions resolve dtypes via getattr(np, ...)
            # (same failure mode model_manager._read_safetensors_numpy
            # handles).
            from safetensors.torch import load_file

            d = load_file(path)
            return next(iter(d.values())).float().numpy()
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    raise ValueError(f"unsupported embedding format: {path}")


_NAMES = {"pos": ("pos_emb.pt", "pos_emb.safetensors", "pos_emb.npy"),
          "neg": ("neg_emb.pt", "neg_emb.safetensors", "neg_emb.npy")}


def find_embedding_path(kind: str, search_dirs,
                        include_packaged: bool = True) -> Optional[str]:
    """The exact file load_text_embeddings would serve for `kind`
    ("pos"/"neg"), or None. Shared with the --doctor report so the
    diagnosis matches the loader's search order. User dirs win over the
    packaged assets."""
    dirs = list(search_dirs)
    if include_packaged:
        dirs.append(ASSETS_DIR)
    for d in dirs:
        if not d or not os.path.isdir(d):
            continue
        for c in _NAMES[kind]:
            p = os.path.join(d, c)
            if os.path.isfile(p):
                return p
    return None


def load_text_embeddings(search_dirs, debug=None,
                         txt_dim: int = TXT_DIM,
                         allow_zero: bool = False) -> Dict[str, np.ndarray]:
    """Find pos_emb/neg_emb in the given directories (model_dir, cwd, ...),
    falling back to the packaged published embeddings (assets/).

    `txt_dim` is the serving model's text width (DiTConfig.txt_in_dim — 5120
    for the published 3B/7B, but config-sniffed checkpoints can differ): a
    user-provided file that doesn't match it fails here with a clear message
    instead of as a shape error mid-DiT; the packaged assets are silently
    skipped on mismatch (they only condition the published models).

    If nothing resolves, a published-width model (txt_dim == 5120) raises —
    unconditioned output is an output-correctness hazard, not a degraded
    mode. Pass allow_zero=True (CLI: --allow_zero_embeddings) for zero
    embeddings, which are only appropriate for benchmarking. Custom-width
    checkpoints keep the warn+zeros behavior (no published embeddings exist
    for them)."""
    out: Dict[str, Optional[np.ndarray]] = {"pos": None, "neg": None}
    for kind in out:
        p = find_embedding_path(kind, search_dirs, include_packaged=False)
        if p is None:
            pk = find_embedding_path(kind, (), include_packaged=True)
            if pk is not None:
                emb = _load_one(pk)
                if emb.shape[-1] == txt_dim:
                    out[kind] = emb
                elif debug:
                    debug.log(
                        f"packaged {kind}_emb dim {emb.shape[-1]} != model "
                        f"txt_in_dim {txt_dim}; skipping",
                        category="setup")
            continue
        emb = _load_one(p)
        if emb.shape[-1] != txt_dim:
            raise ValueError(
                f"{p}: text embedding dim {emb.shape[-1]} does "
                f"not match the model's txt_in_dim {txt_dim}")
        out[kind] = emb
    if out["pos"] is None:
        if not allow_zero and txt_dim == TXT_DIM:
            raise FileNotFoundError(
                "pos_emb not found in search dirs or packaged assets — a "
                "published-model run without text conditioning produces "
                "wrong output. Provide pos_emb.pt/.safetensors/.npy next "
                "to the weights, or pass --allow_zero_embeddings to "
                "benchmark without conditioning.")
        if debug:
            debug.log("text embeddings not found; using zeros",
                      level="WARNING", category="setup", force=True)
        out["pos"] = np.zeros((POS_LEN, txt_dim), np.float32)
    if out["neg"] is None:
        out["neg"] = np.zeros((NEG_LEN, txt_dim), np.float32)
    return {"pos": out["pos"], "neg": out["neg"]}
