"""Inference tensor parallelism for the NaDiT (BASELINE config #5: 7B at 4K
sharded over an ICI mesh).

The TPU answer to the reference's dormant Ulysses head-scatter
(src/common/distributed/ops.py:190-318): instead of all-to-all'ing the
sequence around every attention, the WEIGHTS shard over a `tp` mesh axis —
attention heads for qkv/proj_out, the hidden dim for the mlp — and the
forward runs as one shard_map program per chip with a single psum after
each row-sharded projection. Window attention is embarrassingly parallel
over heads (rope tables and qk-norm weights are per-head_dim, not
per-head), so each chip runs the full Pallas flash kernel on its local
heads with zero attention-time communication.

Per-layer communication: 2 psums of the (B, L, D) activations (attention
proj_out + mlp proj_out) riding ICI — the same volume Megatron-style TP
pays, and 3-6x less than sequence-gather/head-scatter all-to-alls.

Weight layout: the packed qkv projection orders its output dim (3, H, Dh)
(nadit.py:516), so a contiguous tp-slice of columns would split q/k/v, not
heads. `permute_qkv_cols` reorders columns to (tp, 3, H/tp, Dh) so every
chip's slice is its own heads' packed (3, Hloc, Dh) block and the packed
kernel runs unmodified with Hloc heads. proj_out rows and mlp hidden are
naturally head-/column-major and shard without permutation.
"""

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.configs import DiTConfig


def tp_compatible(params: dict, cfg: DiTConfig, tp: int) -> bool:
    """Dense weights only (quantized serving modes keep their own kernels),
    heads and mlp hidden divisible by tp."""
    if tp <= 1:
        return False
    if cfg.heads % tp:
        return False
    blk = params["blocks"][0]
    for branch in blk["attn"]["proj_qkv"].values():
        if "w" not in branch:
            return False
    for mlp in blk["mlp"].values():
        for proj in mlp.values():
            if isinstance(proj, dict) and "w" not in proj:
                return False
        hidden = (mlp["proj_in"]["w"].shape[-1])
        if hidden % tp:
            return False
    return True


def permute_qkv_cols(arr, heads: int, head_dim: int, tp: int):
    """Reorder the qkv out-dim (3, H, Dh) -> (tp, 3, H/tp, Dh) so the
    tp-contiguous column slice of chip d is exactly its heads' packed
    (3, Hloc, Dh) block. Works on the last axis of weights (K, 3HD) and
    biases (3HD,)."""
    hloc = heads // tp
    lead = arr.shape[:-1]
    x = arr.reshape(*lead, 3, tp, hloc, head_dim)
    order = tuple(range(len(lead)))
    x = x.transpose(*order, len(lead) + 1, len(lead), len(lead) + 2,
                    len(lead) + 3)
    return x.reshape(*lead, 3 * heads * head_dim)


def _block_specs(blk: dict, cfg: DiTConfig, tp: int):
    """PartitionSpec tree for one transformer block (mirrors the params)."""

    def qkv_spec(p):
        out = {"w": P(None, "tp")}
        if "b" in p:
            out["b"] = P("tp")
        return out

    def row_spec(p):
        out = {"w": P("tp", None)}
        if "b" in p:
            out["b"] = P()
        return out

    def col_spec(p):
        out = {"w": P(None, "tp")}
        if "b" in p:
            out["b"] = P("tp")
        return out

    spec = {
        "attn": {
            "proj_qkv": {b: qkv_spec(p)
                         for b, p in blk["attn"]["proj_qkv"].items()},
            "proj_out": {b: row_spec(p)
                         for b, p in blk["attn"]["proj_out"].items()},
            "norm_q": jax.tree.map(lambda _: P(), blk["attn"]["norm_q"]),
            "norm_k": jax.tree.map(lambda _: P(), blk["attn"]["norm_k"]),
        },
        "ada": jax.tree.map(lambda _: P(), blk["ada"]),
        "mlp": {},
    }
    for b, mlp in blk["mlp"].items():
        m = {}
        for name, p in mlp.items():
            m[name] = row_spec(p) if name == "proj_out" else col_spec(p)
        spec["mlp"][b] = m
    return spec


def tp_shard_dit_params(mesh: Mesh, params: dict,
                        cfg: DiTConfig) -> Tuple[dict, dict]:
    """Permute qkv columns and lay the tree out over the mesh 'tp' axis.

    Returns (sharded_params, spec_tree); spec_tree is the shard_map in_spec
    for the params argument of the tp forward."""
    tp = mesh.shape["tp"]
    out = {k: v for k, v in params.items() if k != "blocks"}
    specs = {k: jax.tree.map(lambda _: P(), v)
             for k, v in out.items()}

    blocks, blk_specs = [], []
    for blk in params["blocks"]:
        nb = jax.tree.map(lambda x: x, blk)  # shallow-ish copy of the tree
        for branch, p in nb["attn"]["proj_qkv"].items():
            p = dict(p)
            p["w"] = permute_qkv_cols(np.asarray(p["w"]), cfg.heads,
                                      cfg.head_dim, tp)
            if "b" in p and p["b"] is not None:
                p["b"] = permute_qkv_cols(np.asarray(p["b"]), cfg.heads,
                                          cfg.head_dim, tp)
            nb["attn"]["proj_qkv"][branch] = p
        blocks.append(nb)
        blk_specs.append(_block_specs(nb, cfg, tp))
    out["blocks"] = blocks
    specs["blocks"] = blk_specs

    sharded = jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        out, specs)
    return sharded, specs
