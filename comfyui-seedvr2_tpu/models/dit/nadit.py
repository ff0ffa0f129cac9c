"""NaDiT — Native-resolution Diffusion Transformer, TPU-native.

Functionally equivalent to the reference NaDiT 3B/7B
(src/models/dit_3b/nadit.py:39-248, src/models/dit_7b/nadit.py:25-178) but
redesigned for XLA:

 - No varlen packing: the pipeline runs same-shape batches, so activations are
   dense (B, L, D) arrays and 3D windows become static gather/attend/scatter
   with per-shape groups (models/dit/windows.py).
 - Window indices, RoPE tables and the patchify layout are computed at trace
   time from a DiTPlan; inside jit everything is static-shape matmul + one
   flash-attention call per window shape group.
 - The parameter tree mirrors the reference checkpoint key structure
   (blocks.{i}.attn.proj_qkv.{vid,txt,all}...), so safetensors load is a
   rename-free transpose.

Faithfully replicated quirks (verified against the reference on CPU):
 - 3B `vid_out_ada` reuses the *block attn-layer* emb modulation because of a
   cache-key collision in the reference (modulation.py:80-86 caches
   `emb_repeat_0_vid` across blocks AND the output ada whose own reshape is
   shape-inconsistent); released checkpoints bake in this behavior.
 - MM sharing: 3B blocks >= mm_layers share vid/txt weights ("all" branch);
   the 3B last block has no txt mlp/ada branch; 7B qk-norms are never shared.
"""

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core.configs import DiTConfig
from ...ops.attention import attention, packed_attention
from ...ops.gather import gather_rows
from ...ops.layers import linear, mlp_forward, rms_norm, silu, swiglu_hidden_dim
from . import rope as rope_lib
from .windows import (LayerPlan, UniformPlan, build_layer_plan,
                      build_uniform_plan)


# --------------------------------------------------------------------------
# Plans
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class RopedGroup:
    shape: Tuple[int, int, int]
    idx: np.ndarray        # (n, wlen) int32
    # extended rope tables (wlen + txt_len, head_dim) fp32 with identity rows
    # for text/pad positions — consumed fused inside the attention kernel
    cos: Optional[np.ndarray]
    sin: Optional[np.ndarray]


@dataclass(frozen=True)
class RopedLayerPlan:
    groups: Tuple[RopedGroup, ...]
    inv: np.ndarray        # canonical[c] = window_major[inv[c]]
    flat: np.ndarray       # window_major[j] = canonical[flat[j]]
    num_windows: int


@dataclass(frozen=True)
class UniformAttnPlan:
    """Uniform padded partition of one window method (the TPU fast path).

    The reference's ragged windows are recovered exactly by a uniform grid
    with per-axis padding (windows.py build_uniform_plan): partition becomes
    reshape/transpose (no gathers), all windows share one shape (single
    flash-attention launch per layer), pad slots are excluded from softmax
    with `valid`, and per-window rope tables (deduplicated over boundary
    patterns) are streamed into the kernel by `ids`."""

    up: UniformPlan
    ids: np.ndarray     # (num_windows,) int32 -> unique table/mask id
    cos: np.ndarray     # (nU, wlen + txt_len, head_dim) fp32
    sin: np.ndarray
    valid: np.ndarray   # (nU, wlen + txt_len) bool


@dataclass(frozen=True)
class DiTPlan:
    """Static per-(T,H,W,txt_len) geometry for a jitted NaDiT forward.

    Two attention layouts are planned:
     - `uniform` (default on): uniform padded windows, tokens stay in
       canonical raster order; partition is a reshape/transpose inside the
       attention sublayer.
     - grouped fallback (`layer_plans`): per-shape window groups with tokens
       kept in *window-major* order across the block stack; each layer
       applies one composed permutation (`transitions[(a, b)]`) instead of a
       gather per q/k/v plus a scatter back."""

    vid_shape: Tuple[int, int, int]   # pre-patch latent (T, H, W)
    grid: Tuple[int, int, int]        # post-patch token grid (Tp, Hp, Wp)
    txt_len: int
    layer_plans: Dict[str, RopedLayerPlan]
    transitions: Dict[Tuple[str, str], np.ndarray]
    txt_cos: Optional[np.ndarray]
    txt_sin: Optional[np.ndarray]
    uniform: Optional[Dict[str, UniformAttnPlan]] = None

    @property
    def seq_len(self) -> int:
        t, h, w = self.grid
        return t * h * w


def _window_table(cfg: DiTConfig, real_shape, txt_len: int):
    """(rlen, rot) cos/sin for one real window extent (identity if no rope)."""
    if cfg.rope_type == "mmrope3d":
        return rope_lib.mmrope3d_video_table(real_shape, txt_len, cfg.rope_dim)
    if cfg.rope_type == "rope3d_window":
        return rope_lib.rope3d_pixel_table(real_shape, cfg.rope_dim)
    rlen = int(np.prod(real_shape))
    return (np.ones((rlen, 0), np.float32), np.zeros((rlen, 0), np.float32))


def _build_uniform_attn_plan(cfg: DiTConfig, grid, txt_len: int,
                             method: str) -> UniformAttnPlan:
    up = build_uniform_plan(grid, cfg.window, method)
    key_to_id: Dict[tuple, int] = {}
    tabs: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    ids = np.zeros(up.num_windows, np.int32)
    for wdx, info in enumerate(up.win_info):
        if info not in key_to_id:
            real_shape = (info[0][0], info[1][0], info[2][0])
            cr, sr = _window_table(cfg, real_shape, txt_len)
            ce, se = rope_lib.embed_window_table(
                cr, sr, up.wshape, info, cfg.head_dim, txt_len)
            valid = np.concatenate(
                [up.kv_valid[wdx], np.ones(txt_len, dtype=bool)])
            key_to_id[info] = len(tabs)
            tabs.append((ce, se, valid))
        ids[wdx] = key_to_id[info]
    return UniformAttnPlan(
        up=up, ids=ids,
        cos=np.stack([t[0] for t in tabs]),
        sin=np.stack([t[1] for t in tabs]),
        valid=np.stack([t[2] for t in tabs]),
    )


def build_dit_plan(cfg: DiTConfig, vid_shape: Tuple[int, int, int],
                   txt_len: int, uniform: bool = False) -> DiTPlan:
    """Plan the static window geometry for one (T, H, W, txt_len).

    uniform=True switches attention to the uniform padded partition
    (UniformAttnPlan). Measured on v5e at 4K shapes it loses ~1 s/step to
    XLA transpose/pad traffic (4 full-tensor layout transforms per layer vs
    the grouped path's single composed permutation; see
    docs/performance.md), so the window-major grouped path stays the
    default. The uniform path remains supported (and tested: grouped ==
    uniform to 2e-5 fp32) as the simpler reference implementation."""
    T, H, W = vid_shape
    pt, ph, pw = cfg.patch_size
    assert H % ph == 0 and W % pw == 0, "latent H/W must be patch-divisible"
    # temporal: first frame repeated so T % pt == 1 is handled (patch_v1.py:89)
    Tp = (T + pt - 1) // pt if T % pt != 0 or pt == 1 else T // pt
    if pt == 1:
        Tp = T
    grid = (Tp, H // ph, W // pw)

    layer_plans = {}
    for method in ("window", "shifted_window"):
        base = build_layer_plan(grid, cfg.window, method)
        groups = []
        for g in base.groups:
            if cfg.rope_type == "mmrope3d":
                cos, sin = rope_lib.mmrope3d_video_table(
                    g.shape, txt_len, cfg.rope_dim)
            elif cfg.rope_type == "rope3d_window":
                cos, sin = rope_lib.rope3d_pixel_table(g.shape, cfg.rope_dim)
            else:
                cos = sin = None
            if cos is not None:
                # extend to head_dim + rows for the appended text tokens.
                # 3B text rope (1D tables) is BAKED into those rows so the
                # packed kernel rotates video and text uniformly in one
                # pass; 7B text rows stay identity (text is not rotated).
                wlen = cos.shape[0]
                cos, sin = rope_lib.extend_tables(cos, sin, cfg.head_dim,
                                                  extra_rows=txt_len)
                if cfg.rope_type == "mmrope3d" and txt_len > 0:
                    tc, ts = rope_lib.mmrope3d_text_table(txt_len,
                                                          cfg.rope_dim)
                    cos[wlen:wlen + txt_len, :tc.shape[1]] = tc
                    sin[wlen:wlen + txt_len, :ts.shape[1]] = ts
            groups.append(RopedGroup(shape=g.shape, idx=g.idx, cos=cos, sin=sin))
        flat = np.concatenate([g.idx.reshape(-1) for g in base.groups])
        layer_plans[method] = RopedLayerPlan(
            groups=tuple(groups), inv=base.inv, flat=flat.astype(np.int32),
            num_windows=base.num_windows)

    if cfg.rope_type == "mmrope3d":
        txt_cos, txt_sin = rope_lib.mmrope3d_text_table(txt_len, cfg.rope_dim)
    else:
        txt_cos = txt_sin = None

    # composed order transitions: wm_b = wm_a[inv_a[flat_b]]
    transitions: Dict[Tuple[str, str], np.ndarray] = {}
    methods = ("window", "shifted_window")
    for m in methods:
        transitions[("canonical", m)] = layer_plans[m].flat
        transitions[(m, "canonical")] = layer_plans[m].inv
    for a in methods:
        for b in methods:
            if a != b:
                transitions[(a, b)] = layer_plans[a].inv[
                    layer_plans[b].flat].astype(np.int32)
    uniform_plans = None
    if uniform:
        uniform_plans = {
            m: _build_uniform_attn_plan(cfg, grid, txt_len, m)
            for m in ("window", "shifted_window")
        }
    return DiTPlan(vid_shape=vid_shape, grid=grid, txt_len=txt_len,
                   layer_plans=layer_plans, transitions=transitions,
                   txt_cos=txt_cos, txt_sin=txt_sin, uniform=uniform_plans)


# --------------------------------------------------------------------------
# Parameter init (shapes mirror the reference checkpoints)
# --------------------------------------------------------------------------


def _linear_init(key, d_in, d_out, bias=True, dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    p = {"w": jax.random.uniform(k1, (d_in, d_out), jnp.float32,
                                 -bound, bound).astype(dtype)}
    if bias:
        p["b"] = jax.random.uniform(k2, (d_out,), jnp.float32,
                                    -bound, bound).astype(dtype)
    return p


def _mm_branches(cfg: DiTConfig, i: int) -> List[str]:
    if cfg.block_shared(i):
        return ["all"]
    if cfg.block_vid_only(i):
        return ["vid"]
    return ["vid", "txt"]


def init_dit_params(key, cfg: DiTConfig, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(key, 20 + cfg.num_layers * 40))
    D, Dh, Hn = cfg.vid_dim, cfg.head_dim, cfg.heads
    inner = Hn * Dh
    pt, ph, pw = cfg.patch_size

    params = {
        "vid_in": {"proj": _linear_init(next(keys),
                                        cfg.vid_in_channels * pt * ph * pw, D,
                                        dtype=dtype)},
        "emb_in": {
            "proj_in": _linear_init(next(keys), 256, D, dtype=dtype),
            "proj_hid": _linear_init(next(keys), D, D, dtype=dtype),
            "proj_out": _linear_init(next(keys), D, cfg.emb_dim, dtype=dtype),
        },
        "vid_out": {"proj": _linear_init(next(keys), D,
                                         cfg.vid_out_channels * pt * ph * pw,
                                         dtype=dtype)},
    }
    if cfg.txt_in_dim and cfg.txt_in_dim != cfg.txt_dim:
        params["txt_in"] = _linear_init(next(keys), cfg.txt_in_dim, D,
                                        dtype=dtype)
    if cfg.upscaler:
        params["emb_scale"] = {
            "proj_in": _linear_init(next(keys), 256, D, dtype=dtype),
            "proj_hid": _linear_init(next(keys), D, D, dtype=dtype),
            "proj_out": _linear_init(next(keys), D, cfg.emb_dim, dtype=dtype),
        }

    blocks = []
    for i in range(cfg.num_layers):
        qkv_branches = ["all"] if cfg.block_shared(i) else ["vid", "txt"]
        mlp_branches = _mm_branches(cfg, i)
        # 7B qk-norms are never shared (mmdit_window_block.py:51-52).
        norm_branches = (qkv_branches if cfg.family == "dit_3b"
                         else ["vid", "txt"])
        blk = {
            "attn": {
                "proj_qkv": {b: _linear_init(next(keys), D, inner * 3,
                                             bias=cfg.qk_bias, dtype=dtype)
                             for b in qkv_branches},
                "proj_out": {b: _linear_init(next(keys), inner, D, dtype=dtype)
                             for b in qkv_branches},
                "norm_q": {b: {"weight": jnp.ones((Dh,), dtype)}
                           for b in norm_branches},
                "norm_k": {b: {"weight": jnp.ones((Dh,), dtype)}
                           for b in norm_branches},
            },
        }
        if cfg.mlp_type == "swiglu":
            hidden = swiglu_hidden_dim(D, cfg.expand_ratio)
            blk["mlp"] = {b: {
                "proj_in_gate": _linear_init(next(keys), D, hidden, bias=False,
                                             dtype=dtype),
                "proj_in": _linear_init(next(keys), D, hidden, bias=False,
                                        dtype=dtype),
                "proj_out": _linear_init(next(keys), hidden, D, bias=False,
                                         dtype=dtype),
            } for b in mlp_branches}
        else:
            blk["mlp"] = {b: {
                "proj_in": _linear_init(next(keys), D, D * cfg.expand_ratio,
                                        dtype=dtype),
                "proj_out": _linear_init(next(keys), D * cfg.expand_ratio, D,
                                         dtype=dtype),
            } for b in mlp_branches}
        blk["ada"] = {}
        for b in mlp_branches:
            ada = {}
            for layer in ("attn", "mlp"):
                k1, k2, k3 = jax.random.split(next(keys), 3)
                ada[f"{layer}_shift"] = (
                    jax.random.normal(k1, (D,)) / np.sqrt(D)).astype(dtype)
                ada[f"{layer}_scale"] = (
                    jax.random.normal(k2, (D,)) / np.sqrt(D) + 1).astype(dtype)
                ada[f"{layer}_gate"] = (
                    jax.random.normal(k3, (D,)) / np.sqrt(D)).astype(dtype)
            blk["ada"][b] = ada
        blocks.append(blk)
    params["blocks"] = blocks

    if cfg.vid_out_norm:
        params["vid_out_norm"] = {"weight": jnp.ones((D,), dtype)}
        k1, k2 = jax.random.split(next(keys))
        params["vid_out_ada"] = {
            "out_shift": (jax.random.normal(k1, (D,)) / np.sqrt(D)).astype(dtype),
            "out_scale": (jax.random.normal(k2, (D,)) / np.sqrt(D) + 1).astype(dtype),
        }
    return params


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _pick(p: dict, branch: str) -> dict:
    """MMModule branch resolution: shared weights live under 'all'."""
    return p["all"] if "all" in p else p[branch]


def _time_embedding(params, timestep: jnp.ndarray, dtype) -> jnp.ndarray:
    """Sinusoidal(256) -> SiLU MLP -> (B, 6*D). emb = [sin | cos], no flip."""
    half = 128
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    freqs = jnp.asarray(np.exp(exponent))
    arg = timestep.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1).astype(dtype)
    emb = linear(emb, params["proj_in"])
    emb = silu(emb)
    emb = linear(emb, params["proj_hid"])
    emb = silu(emb)
    return linear(emb, params["proj_out"])


def _ada_in(x, shift_a, scale_a, p_ada, layer: str):
    scale_b = p_ada[f"{layer}_scale"].astype(x.dtype)
    shift_b = p_ada[f"{layer}_shift"].astype(x.dtype)
    return x * (scale_a[:, None, :].astype(x.dtype) + scale_b) + (
        shift_a[:, None, :].astype(x.dtype) + shift_b)


def _norm_mod(x, shift_a, scale_a, p_ada, layer: str, eps: float,
              p_consumer):
    """rms_norm + AdaSingle modulation, the producer of every video-branch
    matmul input. When the consuming projection serves w8a8, the whole
    chain runs as ONE fused Pallas pass that also emits the per-row int8
    quantization the matmul needs (ops/fused_quant.rms_ada_quantize) —
    the separate norm/modulate/absmax/round HBM passes disappear."""
    if p_consumer is not None and "w8a8" in p_consumer:
        from ...ops.fused_quant import rms_ada_quantize

        scale = (scale_a.astype(jnp.float32)
                 + p_ada[f"{layer}_scale"].astype(jnp.float32)[None])
        shift = (shift_a.astype(jnp.float32)
                 + p_ada[f"{layer}_shift"].astype(jnp.float32)[None])
        return rms_ada_quantize(x, scale, shift, eps)
    return _ada_in(rms_norm(x, eps), shift_a, scale_a, p_ada, layer)


def _ada_out(x, gate_a, p_ada, layer: str):
    gate_b = p_ada[f"{layer}_gate"].astype(x.dtype)
    return x * (gate_a[:, None, :].astype(x.dtype) + gate_b)


def _fold_norm_tables(cos_e: np.ndarray, sin_e: np.ndarray, wq_v, wq_t,
                      wk_v, wk_t, wlen: int, skv: int):
    """Fold the qk-norm weights into per-row rope tables (trace-time, tiny):
    rope(q * w) == q * (cos * w) + rot_half(q) * (sin * perm(w)) where
    perm swaps interleaved pairs. Video rows get the vid branch weight,
    text rows the txt branch weight, pad rows don't matter (masked)."""
    rows, d = cos_e.shape

    def row_w(w_vid, w_txt):
        w = jnp.ones((rows, d), jnp.float32)
        w = w.at[:wlen].set(w_vid.astype(jnp.float32))
        w = w.at[wlen:skv].set(w_txt.astype(jnp.float32))
        return w

    def perm(w):
        return w.reshape(rows, d // 2, 2)[..., ::-1].reshape(rows, d)

    c = jnp.asarray(cos_e)
    s = jnp.asarray(sin_e)
    wq = row_w(wq_v, wq_t)
    wk = row_w(wk_v, wk_t)
    return c * wq, s * perm(wq), c * wk, s * perm(wk)


def _window_attention(p_attn, cfg: DiTConfig, xv, xt, plan: DiTPlan,
                      layer_plan: RopedLayerPlan, tp_axis=None):
    """Joint windowed multi-modal attention for one block.

    xv: (B, L, D) video tokens in *this layer's window-major order* (each
    shape group is a contiguous slice — no gathers); xt: (B, Ltxt, D) text.

    The qkv projection output stays PACKED (B, L, 3*H*D): per group it is
    sliced (free, window-major), concatenated with the packed text tokens +
    lane-alignment pad in ONE materialization, and handed to the fused
    kernel (ops/attention.packed_attention) which performs qk-norm + RoPE
    (text rope baked into the table rows) + online-softmax attention in a
    single pass — the q/k/v split, two norm passes, text pre-rotation, and
    the separate pad pass of the unpacked design never touch HBM. Text
    output is mean-coalesced over all windows (na.py:396-417)."""
    B, L, _ = xv.shape
    Hn, Dh = cfg.heads, cfg.head_dim
    eps = cfg.norm_eps
    ltxt = plan.txt_len

    qkv_v = linear(xv, _pick(p_attn["proj_qkv"], "vid"))   # (B, L, 3HD)
    qkv_t = linear(xt, _pick(p_attn["proj_qkv"], "txt"))   # (B, Lt, 3HD)
    if tp_axis is not None:
        # tensor parallel: qkv columns are head-sharded (parallel/tp.py
        # permutes them so the local slice is a packed (3, Hloc, Dh)
        # block); the whole attention below runs on local heads only
        Hn = qkv_v.shape[-1] // (3 * Dh)

    wq_v = _pick(p_attn["norm_q"], "vid")["weight"]
    wk_v = _pick(p_attn["norm_k"], "vid")["weight"]
    wq_t = _pick(p_attn["norm_q"], "txt")["weight"]
    wk_t = _pick(p_attn["norm_k"], "txt")["weight"]

    vid_chunks = []
    txt_acc = jnp.zeros((B, ltxt, Hn * Dh), jnp.float32)

    offset = 0
    for g in layer_plan.groups:
        n, wlen = g.idx.shape
        size = n * wlen
        skv = wlen + ltxt
        pad = (-skv) % 128
        sk_pad = skv + pad

        win = qkv_v[:, offset:offset + size].reshape(B, n, wlen, 3 * Hn * Dh)
        offset += size
        t = jnp.broadcast_to(qkv_t[:, None], (B, n, ltxt, 3 * Hn * Dh))
        parts = [win, t]
        if pad:
            parts.append(jnp.zeros((B, n, pad, 3 * Hn * Dh), win.dtype))
        packed = jnp.concatenate(parts, axis=2).reshape(
            B * n, sk_pad, 3 * Hn * Dh)

        if g.cos is not None:
            cos_e = np.pad(g.cos, ((0, sk_pad - skv), (0, 0)),
                           constant_values=1.0)
            sin_e = np.pad(g.sin, ((0, sk_pad - skv), (0, 0)))
        else:
            cos_e = np.ones((sk_pad, Dh), np.float32)
            sin_e = np.zeros((sk_pad, Dh), np.float32)
        cq, sq, ck, sk = _fold_norm_tables(cos_e, sin_e, wq_v, wq_t,
                                           wk_v, wk_t, wlen, skv)

        out = packed_attention(packed, Hn, Dh, cq, sq, ck, sk, eps,
                               kv_len=skv).reshape(B, n, sk_pad, Hn * Dh)
        vid_chunks.append(out[:, :, :wlen].reshape(B, size, Hn * Dh))
        txt_acc = txt_acc + out[:, :, wlen:skv].astype(jnp.float32).sum(axis=1)

    vid_out = jnp.concatenate(vid_chunks, axis=1)  # stays window-major
    txt_out = (txt_acc / layer_plan.num_windows).astype(xv.dtype)

    vid_out = linear(vid_out, _pick(p_attn["proj_out"], "vid"),
                     psum_axis=tp_axis)
    txt_out = linear(txt_out, _pick(p_attn["proj_out"], "txt"),
                     psum_axis=tp_axis)
    return vid_out, txt_out


def _to_windows(x: jnp.ndarray, up: UniformPlan) -> jnp.ndarray:
    """(B, L, D) canonical raster -> (B, num_windows, window_len, D) via
    pad + reshape + transpose (layout ops only — no gathers)."""
    B, L, D = x.shape
    T, H, W = up.size
    (ft, bt), (fh, bh), (fw, bw) = up.pads
    nt, nh, nw = up.nwin
    wt, wh, ww = up.wshape
    x = x.reshape(B, T, H, W, D)
    x = jnp.pad(x, ((0, 0), (ft, bt), (fh, bh), (fw, bw), (0, 0)))
    x = x.reshape(B, nt, wt, nh, wh, nw, ww, D)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, nt * nh * nw, wt * wh * ww, D)


def _from_windows(xw: jnp.ndarray, up: UniformPlan) -> jnp.ndarray:
    """Inverse of _to_windows (pad rows are cropped)."""
    B, _, _, D = xw.shape
    T, H, W = up.size
    (ft, _), (fh, _), (fw, _) = up.pads
    nt, nh, nw = up.nwin
    wt, wh, ww = up.wshape
    x = xw.reshape(B, nt, nh, nw, wt, wh, ww, D)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    x = x.reshape(B, nt * wt, nh * wh, nw * ww, D)
    x = x[:, ft:ft + T, fh:fh + H, fw:fw + W]
    return x.reshape(B, T * H * W, D)


def _window_attention_uniform(p_attn, cfg: DiTConfig, xv, xt, plan: DiTPlan,
                              uplan: UniformAttnPlan, tp_axis=None):
    """Joint windowed mm attention over the uniform padded partition.

    xv: (B, L, D) video tokens in *canonical* order. qkv projection and qk
    norms run on the unpadded tokens (identical matmul shapes to the
    reference); only q/k/v are window-partitioned (3 layout transforms in,
    1 out). One flash launch covers every window; padded kv slots are
    softmax-masked, padded q rows are cropped by _from_windows, so the
    result is numerically the per-window attention of the ragged reference
    partition (na.py:583-641) without its varlen machinery."""
    B, L, _ = xv.shape
    Hn, Dh = cfg.heads, cfg.head_dim
    up = uplan.up

    def qkv(x, branch):
        out = linear(x, _pick(p_attn["proj_qkv"], branch))
        # head-sharded under tp: the local qkv slice is (3, Hloc, Dh) —
        # derive Hloc from the projection OUTPUT so every weight layout
        # (dense w / w8a8 / q8 / qa) works (see _window_attention)
        hn = out.shape[-1] // (3 * Dh)
        out = out.reshape(*x.shape[:-1], 3, hn, Dh)
        return out[..., 0, :, :], out[..., 1, :, :], out[..., 2, :, :]

    qv, kv, vv = qkv(xv, "vid")
    qt, kt, vt = qkv(xt, "txt")
    Hn = qv.shape[-2]  # local heads under tp, cfg.heads otherwise

    eps = cfg.norm_eps
    qv = rms_norm(qv, eps, _pick(p_attn["norm_q"], "vid")["weight"])
    kv = rms_norm(kv, eps, _pick(p_attn["norm_k"], "vid")["weight"])
    qt = rms_norm(qt, eps, _pick(p_attn["norm_q"], "txt")["weight"])
    kt = rms_norm(kt, eps, _pick(p_attn["norm_k"], "txt")["weight"])

    if plan.txt_cos is not None:  # 3B mmrope: text is roped too
        qt = rope_lib.apply_rope(qt, plan.txt_cos, plan.txt_sin)
        kt = rope_lib.apply_rope(kt, plan.txt_cos, plan.txt_sin)

    nW, wlen, ltxt = up.num_windows, up.window_len, plan.txt_len

    def windowed_with_txt(x, txt):
        xw = _to_windows(x.reshape(B, L, Hn * Dh), up)
        xw = xw.reshape(B, nW, wlen, Hn, Dh)
        t = jnp.broadcast_to(txt[:, None], (B, nW, ltxt, Hn, Dh))
        return jnp.concatenate([xw, t], axis=2).reshape(
            B * nW, wlen + ltxt, Hn, Dh)

    ids = np.tile(uplan.ids, B)
    out = attention(
        windowed_with_txt(qv, qt),
        windowed_with_txt(kv, kt),
        windowed_with_txt(vv, vt),
        rope_cos=uplan.cos, rope_sin=uplan.sin,
        table_ids=ids, kv_valid=uplan.valid,
    ).reshape(B, nW, wlen + ltxt, Hn, Dh)

    vid_out = _from_windows(out[:, :, :wlen].reshape(B, nW, wlen, Hn * Dh), up)
    # text coalesce: mean over (all non-empty) windows, na.py:396-417
    txt_out = out[:, :, wlen:].astype(jnp.float32).mean(axis=1)
    txt_out = txt_out.astype(xv.dtype).reshape(B, ltxt, Hn * Dh)

    vid_out = linear(vid_out, _pick(p_attn["proj_out"], "vid"),
                     psum_axis=tp_axis)
    txt_out = linear(txt_out, _pick(p_attn["proj_out"], "txt"),
                     psum_axis=tp_axis)
    return vid_out, txt_out


def _block_forward(p_blk, cfg: DiTConfig, i: int, xv, xt, emb_attn, emb_mlp,
                   plan: DiTPlan, order: str = "canonical", tp_axis=None):
    """One NaMMSRTransformerBlock (mmsr_block.py:84-128).

    xv arrives in `order` token order; the block permutes it once into this
    layer's window-major order and returns it in that order (returned as the
    third element). Residuals/norm/ada/mlp are order-independent."""
    method = cfg.window_method(i)
    uplan = plan.uniform[method] if plan.uniform is not None else None
    if uplan is None and order != method:
        xv = gather_rows(xv, plan.transitions[(order, method)])
    vid_only = cfg.block_vid_only(i)
    layer_plan = plan.layer_plans[method]
    eps = cfg.norm_eps

    sa_v, ss_v, sg_v = (emb_attn[..., 0], emb_attn[..., 1], emb_attn[..., 2])
    ma_v, ms_v, mg_v = (emb_mlp[..., 0], emb_mlp[..., 1], emb_mlp[..., 2])

    ada_v = _pick(p_blk["ada"], "vid")
    ada_t = _pick(p_blk["ada"], "txt") if not vid_only else None

    # attention sublayer (vid producer fuses into the w8a8 qkv quantize
    # when serving int8 and not head-sharded — see _norm_mod)
    p_qkv_v = _pick(p_blk["attn"]["proj_qkv"], "vid")
    hv = _norm_mod(xv, sa_v, ss_v, ada_v, "attn", eps,
                   p_qkv_v if tp_axis is None else None)
    ht = rms_norm(xt, eps)
    # 3B last layer: ada is vid_only -> txt enters attention normed but
    # unmodulated and leaves ungated (MMModule.vid_only skips the txt call).
    ht = _ada_in(ht, sa_v, ss_v, ada_t, "attn") if ada_t is not None else ht
    if uplan is not None:
        hv, ht = _window_attention_uniform(p_blk["attn"], cfg, hv, ht,
                                           plan, uplan, tp_axis=tp_axis)
    else:
        hv, ht = _window_attention(p_blk["attn"], cfg, hv, ht, plan,
                                   layer_plan, tp_axis=tp_axis)
    hv = _ada_out(hv, sg_v, ada_v, "attn")
    ht = _ada_out(ht, sg_v, ada_t, "attn") if ada_t is not None else ht
    xv = xv + hv
    xt = xt + ht

    # mlp sublayer
    p_mlp_v = _pick(p_blk["mlp"], "vid")
    hv = _norm_mod(xv, ma_v, ms_v, ada_v, "mlp", eps,
                   (p_mlp_v.get("proj_in_gate", p_mlp_v.get("proj_in"))
                    if tp_axis is None else None))
    hv = mlp_forward(hv, p_mlp_v, cfg.mlp_type,
                     psum_axis=tp_axis)
    hv = _ada_out(hv, mg_v, ada_v, "mlp")
    xv = xv + hv
    if not vid_only:
        ht2 = rms_norm(xt, eps)
        ht2 = _ada_in(ht2, ma_v, ms_v, ada_t, "mlp")
        ht2 = mlp_forward(ht2, _pick(p_blk["mlp"], "txt"), cfg.mlp_type,
                          psum_axis=tp_axis)
        ht2 = _ada_out(ht2, mg_v, ada_t, "mlp")
        xt = xt + ht2
    return xv, xt, ("canonical" if uplan is not None else method)


def patchify(vid: jnp.ndarray, patch_size) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, Tp*Hp*Wp, t*h*w*C), channel order (t h w c)."""
    pt, ph, pw = patch_size
    B, T, H, W, C = vid.shape
    if pt > 1 and T % pt != 1:
        raise ValueError("temporal patching expects T % pt == 1")
    if pt > 1:
        head = jnp.repeat(vid[:, :1], pt - 1, axis=1)
        vid = jnp.concatenate([head, vid], axis=1)
        T = vid.shape[1]
    Tp, Hp, Wp = T // pt, H // ph, W // pw
    x = vid.reshape(B, Tp, pt, Hp, ph, Wp, pw, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, Tp * Hp * Wp, pt * ph * pw * C)


def unpatchify(x: jnp.ndarray, grid, patch_size, out_channels: int,
               orig_t: int) -> jnp.ndarray:
    """(B, L, t*h*w*C) -> (B, T, H, W, C)."""
    pt, ph, pw = patch_size
    Tp, Hp, Wp = grid
    B = x.shape[0]
    x = x.reshape(B, Tp, Hp, Wp, pt, ph, pw, out_channels)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    x = x.reshape(B, Tp * pt, Hp * ph, Wp * pw, out_channels)
    if pt > 1:
        x = x[:, Tp * pt - orig_t:]
    return x


def nadit_forward(params, cfg: DiTConfig, vid: jnp.ndarray, txt: jnp.ndarray,
                  timestep: jnp.ndarray, plan: DiTPlan,
                  downscale: Optional[jnp.ndarray] = None,
                  tp_axis: Optional[str] = None) -> jnp.ndarray:
    """Denoiser forward.

    Args:
        params: parameter pytree from init_dit_params / checkpoint loader.
        vid: (B, T, H, W, vid_in_channels) latent+condition, pre-patch dims.
        txt: (B, txt_len, txt_in_dim) text embeddings.
        timestep: (B,) diffusion timesteps.
        plan: DiTPlan matching (T, H, W, txt_len).
        downscale: (B,) downscale factor for the NaDiTUpscaler variant
            (dit_7b/nadit.py:241-333: emb += emb_scale(downscale)).

    Returns:
        (B, T, H, W, vid_out_channels) prediction (v_lerp velocity).
    """
    B, T = vid.shape[0], vid.shape[1]
    x = patchify(vid, cfg.patch_size)
    x = linear(x, params["vid_in"]["proj"])

    if "txt_in" in params:
        xt = linear(txt, params["txt_in"])
    else:
        xt = txt

    emb = _time_embedding(params["emb_in"], timestep, x.dtype)  # (B, 6D)
    if "emb_scale" in params and downscale is not None:
        emb = emb + _time_embedding(params["emb_scale"], downscale, x.dtype)
    emb_r = emb.reshape(B, cfg.vid_dim, 2, 3).astype(jnp.float32)
    emb_attn, emb_mlp = emb_r[..., 0, :], emb_r[..., 1, :]

    order = "canonical"
    for i, p_blk in enumerate(params["blocks"]):
        x, xt, order = _block_forward(p_blk, cfg, i, x, xt, emb_attn,
                                      emb_mlp, plan, order, tp_axis=tp_axis)
    if order != "canonical":
        x = gather_rows(x, plan.transitions[(order, "canonical")])

    if cfg.vid_out_norm:
        x = rms_norm(x, cfg.norm_eps, params["vid_out_norm"]["weight"])
        # Reference cache-collision: output modulation reuses the blocks'
        # attn-layer emb slices (see module docstring).
        shift_a, scale_a = emb_attn[..., 0], emb_attn[..., 1]
        scale_b = params["vid_out_ada"]["out_scale"].astype(x.dtype)
        shift_b = params["vid_out_ada"]["out_shift"].astype(x.dtype)
        x = x * (scale_a[:, None, :].astype(x.dtype) + scale_b) + (
            shift_a[:, None, :].astype(x.dtype) + shift_b)

    x = linear(x, params["vid_out"]["proj"])
    return unpatchify(x, plan.grid, cfg.patch_size, cfg.vid_out_channels, T)
