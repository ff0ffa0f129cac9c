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


# weight-layout field names (ops/layers.py linear): the 2-D (K, N) weight,
# its per-out-channel scale vectors (shard with the columns, replicate on
# row sharding), and its per-K-group scale planes (shard along K on row
# sharding, along N on column sharding — they tile the weight exactly).
_WEIGHT_FIELDS = ("w", "w8a8", "q8", "qa")
_OUT_VEC_FIELDS = ("ws", "b")
_KGROUP_FIELDS = ("scales", "s", "m")
_QUANT_GROUP = 32  # K-group size of the q8/qa layouts (quant_matmul.GROUP)


def _weight_field(p: dict):
    for f in _WEIGHT_FIELDS:
        if f in p:
            return f
    return None


def _proj_ok(p: dict, tp: int, shard_rows: bool) -> bool:
    """Can this projection's weight layout shard tp ways?

    Row sharding of the grouped-quant layouts (q8/qa) additionally needs
    the per-32-group scale planes to split evenly along K. The int8/quant
    Pallas kernels also need the sharded dim's LOCAL extent lane-tileable
    (%128) — only binding on a real TPU backend (CPU runs use the dense
    emulation path)."""
    f = _weight_field(p)
    if f is None:
        return False
    k, n = p[f].shape[-2:]
    dim = k if shard_rows else n
    if dim % tp:
        return False
    if f != "w":
        if shard_rows and (k // _QUANT_GROUP) % tp:
            return False
        if jax.default_backend() == "tpu" and (dim // tp) % 128:
            return False
    return True


def tp_compatible(params: dict, cfg: DiTConfig, tp: int) -> bool:
    """Heads and mlp hidden divisible by tp; every sharded projection's
    weight layout (dense OR quantized serving — w8a8/q8/qa) splittable."""
    if tp <= 1:
        return False
    if cfg.heads % tp:
        return False
    blk = params["blocks"][0]
    for branch in blk["attn"]["proj_qkv"].values():
        if not _proj_ok(branch, tp, shard_rows=False):
            return False
    for branch in blk["attn"]["proj_out"].values():
        if not _proj_ok(branch, tp, shard_rows=True):
            return False
    for mlp in blk["mlp"].values():
        for name, proj in mlp.items():
            if isinstance(proj, dict):
                if not _proj_ok(proj, tp, shard_rows=(name == "proj_out")):
                    return False
        f = _weight_field(mlp["proj_in"])
        hidden = mlp["proj_in"][f].shape[-1]
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
    """PartitionSpec tree for one transformer block (mirrors the params,
    every weight layout: dense w / w8a8+ws / q8+scales / qa+s+m)."""

    def _spec(p, weight_sp, vec_sp):
        out = {}
        for f, leaf in p.items():
            if leaf is None:
                out[f] = None
            elif f in _WEIGHT_FIELDS or f in _KGROUP_FIELDS:
                out[f] = weight_sp
            elif f in _OUT_VEC_FIELDS:
                out[f] = vec_sp
            else:
                out[f] = P()
        return out

    def col_spec(p):
        """Column (out-dim) sharding: weight + K-group scale planes split
        their last axis; per-out vectors (ws, b) split with the columns."""
        return _spec(p, P(None, "tp"), P("tp"))

    def row_spec(p):
        """Row (K-dim) sharding: weight + K-group planes split axis 0;
        per-out vectors replicate (applied once after the psum)."""
        return _spec(p, P("tp", None), P())

    qkv_spec = col_spec

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
            # every field of a qkv projection has the packed out dim as its
            # LAST axis — the (K, N) weight of any layout, the per-32-group
            # scale planes (K/32, N), and the per-out vectors (ws, b) —
            # so the head-block permutation applies uniformly
            p = {f: (permute_qkv_cols(np.asarray(leaf), cfg.heads,
                                      cfg.head_dim, tp)
                     if leaf is not None else None)
                 for f, leaf in p.items()}
            nb["attn"]["proj_qkv"][branch] = p
        blocks.append(nb)
        blk_specs.append(_block_specs(nb, cfg, tp))
    out["blocks"] = blocks
    specs["blocks"] = blk_specs

    sharded = jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        out, specs)
    return sharded, specs
