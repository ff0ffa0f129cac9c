"""Causal video VAE (s8_c16_t4), TPU-native.

Functional JAX redesign of the reference VAE
(src/models/video_vae_v3/modules/attn_video_vae.py Encoder3D:671/Decoder3D:859,
causal_inflation_lib.py InflatedCausalConv3d:62). Key transformations:

 - The mutable per-conv temporal memory (`self.memory`,
   causal_inflation_lib.py:229-249) becomes an explicit state pytree threaded
   through pure functions: every causal conv reads/writes `state[path]`, so
   temporal slicing is (y, state) = f(params, x, state) — jit-compatible and
   trivially checkpointable.
 - Channels-last NDHWC layout with lax.conv_general_dilated (XLA picks the
   fused TPU conv); no cuDNN-bug workarounds, no memory_limit recursive
   splitting (XLA handles scheduling; spatial tiling bounds peak memory).
 - GroupNorm is computed per-frame exactly like causal_norm_wrapper
   (causal_inflation_lib.py:354-420) with fp32 statistics.

Causal semantics (verified against the reference):
 - temporal pad: first slice prepends the first frame `2*pad_t` times
   (extend_head); later slices prepend the stored tail of the previous
   *extended* input (k_t - s_t frames). Spatial padding is symmetric.
 - decoder temporal upsample duplicates frame 0 (pixel-shuffle of the repeated
   head) so `remove_head` drops frame index 1 on the first slice only.
"""

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.configs import VAEConfig
from ...ops.layers import silu


State = Optional[Dict[str, jnp.ndarray]]

# OPT-IN (SEEDVR2_CONV_IM2COL=1): convs whose contraction K =
# kt*kh*kw*ci fits one MXU lane tile (<= 128) run as an im2col
# patch-matmul instead of conv_general_dilated. ISOLATED, the stock
# conv_in (Ci=3, reference Encoder3D attn_video_vae.py:671+) measured
# 0.2 TF/s on v5e vs 2.7 for the bit-exact im2col form
# (tools/conv_in_study.py) — but IN-CONTEXT the full 4K tiled encode is
# 170 ms SLOWER with it (4.88 vs 4.71 s, tools/encode_ab.py, same
# session): inside the whole encoder program XLA fuses the stock conv's
# producers/consumers well enough that the isolated win inverts. Default
# off; kept because the exactness-tested lowering is the right starting
# point on any future backend where the isolated gap survives fusion.
_IM2COL_MAX_K = 128 if os.environ.get("SEEDVR2_CONV_IM2COL", "0") == "1" \
    else 0

# Decoder upsample as a single lhs-dilated conv (kernel == stride, a pure
# scatter) instead of 1x1 conv + 8-axis pixel-shuffle transpose — attacks
# the ~229 ms/tile "formatting" share of the 4K decode profile (VERDICT r4
# next #3). Bit-equal to the stock path (tests/test_vae_parity.py).
# DEFAULT ON: the in-context 4K A/B (tools/tpu_session_r5.py upsample_ab,
# 3 reps each, one session) measured 11.363 s median vs 11.545 stock
# (-182 ms); SEEDVR2_UPSAMPLE_CONVT=0 reverts.
_UPSAMPLE_CONVT = os.environ.get("SEEDVR2_UPSAMPLE_CONVT", "1") == "1"

# Causal head as a correction conv instead of a concat: the stock path
# prepends the (kt-1)-frame head to the FULL activation (jnp.concatenate
# materializes a whole extra copy per conv — XLA cannot fuse a concat into
# a convolution input). By linearity, a zero-front-padded conv over x plus
# a tiny (kt-1)-frame conv over the head added onto the first output
# frames is exact. Opt-in pending an in-context A/B (same discipline as
# the im2col switch above).
_HEAD_CORRECTION = os.environ.get("SEEDVR2_HEAD_CORRECTION", "0") == "1"


def _conv3d_im2col(x_ext: jnp.ndarray, w: jnp.ndarray,
                   s_pad) -> jnp.ndarray:
    """3D conv as tap-major patch matmul — exact same arithmetic as the
    stock conv (same taps, same accumulation dtype), restructured so the
    tiny-K contraction feeds the MXU as one (M, K) @ (K, Co) matmul."""
    kt, kh, kw, ci, co = w.shape
    xp = jnp.pad(x_ext, ((0, 0), (0, 0), s_pad[0], s_pad[1], (0, 0)))
    T = xp.shape[1] - (kt - 1)
    H = xp.shape[2] - (kh - 1)
    W = xp.shape[3] - (kw - 1)
    taps = [xp[:, dt:dt + T, dh:dh + H, dw:dw + W, :]
            for dt in range(kt) for dh in range(kh) for dw in range(kw)]
    p = jnp.stack(taps, axis=-2)
    m = p.reshape(*p.shape[:-2], kt * kh * kw * ci)
    return jnp.dot(m, w.reshape(kt * kh * kw * ci, co),
                   preferred_element_type=jnp.float32).astype(x_ext.dtype)


def _get(params: dict, path: str) -> dict:
    node = params
    for p in path.split("."):
        node = node[p]
    return node


def causal_conv3d(params: dict, path: str, x: jnp.ndarray, state: State,
                  stride: Tuple[int, int, int] = (1, 1, 1),
                  t_pad: int = 0,
                  s_pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
                  new_state: State = None,
                  pre_extended: bool = False) -> jnp.ndarray:
    """Causal 3D convolution with functional temporal memory.

    x: (B, T, H, W, Cin). `state` holds the previous slice's tail (or None for
    the first / non-sliced call); `new_state` (if a dict) receives this
    slice's tail for the next call. pre_extended=True means the caller
    already prepended the causal head frames (the fused
    norm+silu+head kernel, ops/fused_norm.py).
    """
    p = _get(params, path)
    w = p["w"]  # (kt, kh, kw, ci, co)
    kt = w.shape[0]
    st = stride[0]
    cache = kt - st

    if _HEAD_CORRECTION and not pre_extended and stride == (1, 1, 1) \
            and kt > 1 and x.shape[1] >= cache:
        head = None
        if state is not None and path in state:
            head = state[path].astype(x.dtype)
        elif t_pad > 0:
            head = jnp.repeat(x[:, :1], 2 * t_pad, axis=1)
        if head is not None and head.shape[1] == kt - 1:
            if new_state is not None and cache > 0:
                new_state[path] = x[:, -cache:]
            wd = w.astype(x.dtype)
            out = jax.lax.conv_general_dilated(
                x.astype(x.dtype), wd, window_strides=stride,
                padding=[(kt - 1, 0), s_pad[0], s_pad[1]],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            # head contribution to the first kt-1 output frames: a conv
            # over just the head, back-padded so its taps line up
            corr = jax.lax.conv_general_dilated(
                head, wd, window_strides=stride,
                padding=[(0, kt - 1), s_pad[0], s_pad[1]],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            out = out.at[:, : kt - 1].add(corr)
            if "b" in p:
                out = out + p["b"].astype(x.dtype)
            return out

    if pre_extended:
        x_ext = x
    elif state is not None and path in state:
        head = state[path].astype(x.dtype)
        x_ext = jnp.concatenate([head, x], axis=1)
    elif t_pad > 0:
        head = jnp.repeat(x[:, :1], 2 * t_pad, axis=1)
        x_ext = jnp.concatenate([head, x], axis=1)
    else:
        x_ext = x

    if new_state is not None and cache > 0:
        new_state[path] = x_ext[:, -cache:]

    if (w.shape[0] * w.shape[1] * w.shape[2] * w.shape[3] <= _IM2COL_MAX_K
            and stride == (1, 1, 1)):
        out = _conv3d_im2col(x_ext.astype(x.dtype), w.astype(x.dtype), s_pad)
        if "b" in p:
            out = out + p["b"].astype(x.dtype)
        return out

    # NB: no preferred_element_type=f32 here — the TPU conv accumulates in
    # fp32 internally regardless, while requesting an f32 *output* forces a
    # full-resolution fp32 materialization + copy (profiled at ~10 GB for
    # 1080p decode).
    out = jax.lax.conv_general_dilated(
        x_ext.astype(x.dtype),
        w.astype(x.dtype),
        window_strides=stride,
        padding=[(0, 0), s_pad[0], s_pad[1]],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def frame_group_norm(params: dict, path: str, x: jnp.ndarray,
                     num_groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm with per-frame statistics (causal_norm_wrapper semantics).

    Written so XLA never materializes an fp32 copy of the activation: the
    converts fuse into the two reduction passes and the final bf16-output
    elementwise chain (a materialized x32 was the top HBM allocation in 1080p
    decode — 5 GB per tensor)."""
    p = _get(params, path)
    b, t, h, w, c = x.shape
    g = num_groups
    xr = x.reshape(b, t, h * w, g, c // g)
    # one-pass moments: E[x] and E[x^2] from a single read of the
    # activation. (Measured on v5e: ~1% — XLA already fused the two-pass
    # form — kept for the simpler fusion shape.) f32 accumulators keep the
    # E[x^2]-E[x]^2 cancellation well inside oracle parity tolerance.
    mean = jnp.mean(xr, axis=(2, 4), keepdims=True, dtype=jnp.float32)
    meansq = jnp.mean(jnp.square(xr.astype(jnp.float32)), axis=(2, 4),
                      keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    wgt = p["weight"].astype(jnp.float32).reshape(g, c // g)
    bias = p["b"].astype(jnp.float32).reshape(g, c // g)
    out = ((xr.astype(jnp.float32) - mean) * inv) * wgt + bias
    return out.astype(x.dtype).reshape(b, t, h, w, c)


def _fused_norm_ok() -> bool:
    """Opt-in only (SEEDVR2_FUSED_NORM=1): the Pallas norm+silu+head kernel
    is numerically equivalent (bf16-noise class vs fp32 truth) but MEASURED
    SLOWER than XLA's fused composition on v5e — 4.0 s vs 1.39 s per 4K
    decode tile. The pallas_call is a fusion barrier: XLA can no longer
    overlap the norm chain with the neighboring convs, which outweighs the
    saved extend_head concat. Kept as a tested negative result
    (docs/performance.md)."""
    import os

    if os.environ.get("SEEDVR2_FUSED_NORM") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def norm_silu_conv(params: dict, norm_path: str, conv_path: str,
                   x: jnp.ndarray, state: State, new_state: State,
                   num_groups: int, conv_quant: str = "none") -> jnp.ndarray:
    """GroupNorm -> SiLU -> causal conv (optionally fused via
    ops/fused_norm.py — see _fused_norm_ok; optionally int8 via
    ops/int8_conv.py when conv_quant == "int8" — the normalized input makes
    the per-tensor activation scale well-conditioned).

    The temporal pad is derived from the conv's kernel depth, so the same
    code serves time_receptive_field="full" ((3,3,3) conv2, modern config)
    and "half" ((1,3,3) conv2, the legacy video_vae.py family — whose state
    dict simply stores a depth-1 kernel)."""
    p = _get(params, conv_path)
    kt = int(p["w"].shape[0]) if "w" in p else 3
    from ...ops.int8_conv import (int8_conv3d, int8_conv_viable,
                                  norm_silu_quantize, quantize_conv_weight)

    if conv_quant == "int8" and x.shape[0] == 1 and kt == 3 \
            and int8_conv_viable(p["w"].shape[-2], p["w"].shape[-1],
                                 x.shape[3]):
        # non-viable shapes stay bf16: conv_out's Co=3 (output-critical RGB
        # projection), sub-128 channel dims, and the C=512 wide-W stage
        # whose halo windows exceed the kernel's VMEM budget.
        # The norm+silu+quantize is FUSED (2 HBM passes total, int8_conv.
        # norm_silu_quantize) — v1's separate norm/absmax/round/pad passes
        # were why int8 decode lost to bf16 (docs/performance.md). ACTIVE
        # slices stay int8 too: the carried bf16 tail quantizes with the
        # same scale so numerics are uniform across the temporal seam.
        head = state.get(conv_path) if state is not None else None
        x_ext, scale, tail = norm_silu_quantize(
            x, _get(params, norm_path)["weight"], _get(params, norm_path)["b"],
            num_groups, head=head)
        cache = p["w"].shape[0] - 1  # kt - stride
        if new_state is not None and cache > 0:
            new_state[conv_path] = tail
        if "wq" in p:  # pre-quantized at VideoVAE construction
            wq, ws = p["wq"], p["ws"]
        else:
            wq, ws = quantize_conv_weight(p["w"])
        t_len = x.shape[1]
        out = int8_conv3d(x_ext, wq, jnp.broadcast_to(scale, (t_len,)), ws)
        if "b" in p:
            out = out + p["b"].astype(out.dtype)
        return out[None, :, :, :x.shape[3]]
    if state is None and kt == 3 and _fused_norm_ok():
        from ...ops.fused_norm import norm_silu_head

        p = _get(params, norm_path)
        ext = norm_silu_head(x, p["weight"], p["b"], num_groups)
        return causal_conv3d(params, conv_path, ext, None, t_pad=1,
                             s_pad=((1, 1), (1, 1)), new_state=new_state,
                             pre_extended=True)
    h = frame_group_norm(params, norm_path, x, num_groups)
    h = silu(h)
    return causal_conv3d(params, conv_path, h, state, t_pad=(kt - 1) // 2,
                         s_pad=((1, 1), (1, 1)), new_state=new_state)


def resnet_block(params: dict, path: str, x: jnp.ndarray, state: State,
                 new_state: State, in_ch: int, out_ch: int,
                 num_groups: int = 32, conv_quant: str = "none") -> jnp.ndarray:
    """ResnetBlock3D. Conv kernel depths come from the params (full (3,3,3)
    for the modern config; the legacy "half" family stores conv2 as
    (1,3,3) — norm_silu_conv derives the causal pad either way)."""
    h = norm_silu_conv(params, f"{path}.norm1", f"{path}.conv1", x, state,
                       new_state, num_groups, conv_quant)
    h = norm_silu_conv(params, f"{path}.norm2", f"{path}.conv2", h, state,
                       new_state, num_groups, conv_quant)
    if in_ch != out_ch:
        x = causal_conv3d(params, f"{path}.conv_shortcut", x, state,
                          new_state=new_state)
    return x + h


_ATTN_CHUNK = 4096  # online-softmax kv chunk for long spatial sequences


def _spatial_attention(q, k, v, scale):
    """(B, S, C) single-head attention; chunked online softmax when S is too
    large to materialize (S, S) logits (1080p latent: S=32k -> 4 GB/frame)."""
    s = q.shape[1]
    if s <= _ATTN_CHUNK:
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bqk,bkc->bqc", probs, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    pad = (-s) % _ATTN_CHUNK
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    n_chunks = kp.shape[1] // _ATTN_CHUNK
    kc = kp.reshape(k.shape[0], n_chunks, _ATTN_CHUNK, k.shape[2])
    vc = vp.reshape(v.shape[0], n_chunks, _ATTN_CHUNK, v.shape[2])
    # operands stay bf16 with f32 MXU accumulation (matching the
    # non-chunked path): casting q/k/v to f32 forced f32-rate matmuls,
    # ~4x off bf16 peak. The scale applies to the f32 logits, softmax
    # statistics remain f32; p rounds to the input dtype for the pv
    # matmul like the DiT flash kernel.

    def step(carry, inputs):
        m, l, acc = carry
        kb, vb, idx = inputs
        logit = jnp.einsum("bqc,bkc->bqk", q, kb,
                           preferred_element_type=jnp.float32) * scale
        col = idx * _ATTN_CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, logit.shape, 2)
        logit = jnp.where(col < s, logit, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(logit, axis=-1, keepdims=True))
        p = jnp.exp(logit - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bqk,bkc->bqc", p.astype(v.dtype), vb,
            preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    bsz, sq, c = q.shape
    init = (jnp.full((bsz, sq, 1), -jnp.inf, jnp.float32),
            jnp.zeros((bsz, sq, 1), jnp.float32),
            jnp.zeros((bsz, sq, c), jnp.float32))
    (m, l, acc), _ = jax.lax.scan(
        step, init,
        (kc.transpose(1, 0, 2, 3), vc.transpose(1, 0, 2, 3),
         jnp.arange(n_chunks)))
    return (acc / l).astype(q.dtype)


def attn_block(params: dict, path: str, x: jnp.ndarray,
               num_groups: int = 32) -> jnp.ndarray:
    """Per-frame single-head spatial attention (UNetMidBlock3D attention,
    attn_video_vae.py:656-668; diffusers deprecated attn block semantics:
    group norm -> q,k,v linear -> softmax(QK^T / sqrt(C)) -> out linear ->
    residual)."""
    p = _get(params, path)
    b, t, h, w, c = x.shape
    hid = frame_group_norm(params, f"{path}.group_norm", x, num_groups)
    hid = hid.reshape(b * t, h * w, c)

    def lin(name, z):
        q = p[name]
        out = jnp.dot(z, q["w"].astype(z.dtype),
                      preferred_element_type=jnp.float32).astype(z.dtype)
        return out + q["b"].astype(z.dtype)

    q, k, v = lin("to_q", hid), lin("to_k", hid), lin("to_v", hid)
    out = _spatial_attention(q, k, v, scale=c ** -0.5)
    out = jnp.dot(out, p["to_out"]["0"]["w"].astype(out.dtype),
                  preferred_element_type=jnp.float32).astype(out.dtype)
    out = out + p["to_out"]["0"]["b"].astype(out.dtype)
    return out.reshape(b, t, h, w, c) + x


def _mid_block(params, path, x, state, new_state, ch, num_groups,
               conv_quant="none", attention=True):
    """UNetMidBlock3D: resnet -> (spatial attention) -> resnet. The legacy
    video_vae.py mid block has no attention (video_vae.py:440-466)."""
    x = resnet_block(params, f"{path}.resnets.0", x, state, new_state, ch, ch,
                     num_groups, conv_quant)
    if attention:
        x = attn_block(params, f"{path}.attentions.0", x, num_groups)
    x = resnet_block(params, f"{path}.resnets.1", x, state, new_state, ch, ch,
                     num_groups, conv_quant)
    return x


# --------------------------------------------------------------------------
# Encoder / Decoder cores (single temporal slice)
# --------------------------------------------------------------------------


def encoder_core(params: dict, cfg: VAEConfig, x: jnp.ndarray,
                 state: State) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """x: (B, T, H, W, 3) in [-1, 1] -> (B, Tl, H/8, W/8, 2*latent).

    state=None means first slice (INITIALIZING); otherwise previous tails.
    Returns (moments, new_state).
    """
    new_state: Dict[str, jnp.ndarray] = {}
    g = cfg.norm_num_groups
    chans = cfg.block_out_channels
    n_blocks = len(chans)

    x = causal_conv3d(params, "encoder.conv_in", x, state, t_pad=1,
                      s_pad=((1, 1), (1, 1)), new_state=new_state)
    in_ch = chans[0]
    for i in range(n_blocks):
        out_ch = chans[i]
        base = f"encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            x = resnet_block(params, f"{base}.resnets.{j}", x, state, new_state,
                             in_ch if j == 0 else out_ch, out_ch, g)
        in_ch = out_ch
        is_final = i == n_blocks - 1
        if not is_final:
            temporal_down = i >= n_blocks - cfg.temporal_scale_num - 1
            # Downsample3D: spatial stride 2 with asymmetric (0,1) pad
            # (attn_video_vae.py:242-244), temporal stride 2 causal when
            # enabled (kernel (3,3,3), t_pad=1).
            x = causal_conv3d(
                params, f"{base}.downsamplers.0.conv", x, state,
                stride=(2 if temporal_down else 1, 2, 2),
                t_pad=1 if temporal_down else 0,
                s_pad=((0, 1), (0, 1)),
                new_state=new_state,
            )

    x = _mid_block(params, "encoder.mid_block", x, state, new_state,
                   chans[-1], g, attention=cfg.mid_attention)
    x = norm_silu_conv(params, "encoder.conv_norm_out", "encoder.conv_out",
                       x, state, new_state, g)
    if cfg.use_quant_conv:
        # 1x1x1 causal conv over the moments (video_vae.py:765-775); depth-1
        # kernel, so no temporal state.
        x = causal_conv3d(params, "quant_conv", x, state, new_state=new_state)
    return x, new_state


def _pixel_shuffle_3d(x: jnp.ndarray, sr: int, tr: int) -> jnp.ndarray:
    """MAGViT upsample shuffle, channel group order (x y z c)
    (attn_video_vae.py:137-143)."""
    b, t, h, w, cc = x.shape
    c = cc // (sr * sr * tr)
    x = x.reshape(b, t, h, w, sr, sr, tr, c)
    # out[b, t*tr+z, h*sr+xi, w*sr+yi, c] = in[..., xi, yi, z, c]
    x = x.transpose(0, 1, 6, 2, 4, 3, 5, 7)
    return x.reshape(b, t * tr, h * sr, w * sr, c)


def _upsample_conv_transpose(x, p, sr: int, tr: int):
    """upscale_conv (1x1x1, ch -> ch*sr*sr*tr) + pixel shuffle expressed as
    ONE lhs-dilated conv: out[b, t*tr+z, h*sr+xi, w*sr+yi, c] =
    x[b,t,h,w,:] @ W[:, ((xi*sr+yi)*tr+z)*C + c]. The kernel window equals
    the stride, so the transposed conv is a pure scatter — the MXU writes
    the shuffled layout directly and the 8-axis transpose copy of
    _pixel_shuffle_3d never materializes. The phase-dependent bias (the
    reference's per-(x,y,z,c) conv bias) broadcasts over free dim splits."""
    ci = x.shape[-1]
    w = p["w"][0, 0, 0].astype(x.dtype)                 # (ci, ratio*c)
    c = w.shape[1] // (sr * sr * tr)
    k = w.reshape(ci, sr, sr, tr, c).transpose(3, 1, 2, 0, 4)  # (tr,sr,sr,ci,c)
    # conv_transpose correlates against the REVERSED taps (the scatter of
    # x[t] lands at out[t*s + (k-1) - j]); flip so phase j means out offset j
    k = k[::-1, ::-1, ::-1]
    y = jax.lax.conv_transpose(
        x, k, strides=(tr, sr, sr), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    b, t, h, wd, _ = x.shape
    bias = p["b"].astype(x.dtype).reshape(sr, sr, tr, c)
    bias = bias.transpose(2, 0, 1, 3)                   # (tr, sr, sr, c)
    y = y.reshape(b, t, tr, h, sr, wd, sr, c) + bias[None, None, :, None,
                                                     :, None, :, :]
    return y.reshape(b, t * tr, h * sr, wd * sr, c)


def _upsample3d(params, path, x, state, new_state, temporal_up: bool,
                first_slice: bool):
    p = _get(params, f"{path}.upscale_conv")
    tr = 2 if temporal_up else 1
    if _UPSAMPLE_CONVT:
        y = _upsample_conv_transpose(x, p, 2, tr)
    else:
        # 1x1x1 conv ch -> ch * ratio
        y = jnp.einsum("bthwc,co->bthwo", x,
                       p["w"][0, 0, 0].astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y + p["b"].astype(x.dtype)
        y = _pixel_shuffle_3d(y, 2, tr)
    if temporal_up and first_slice:
        # remove_head: drop duplicated frame 1 (causal_inflation_lib.py:424-432)
        y = jnp.concatenate([y[:, :1], y[:, 2:]], axis=1)
    y = causal_conv3d(params, f"{path}.conv", y, state, t_pad=1,
                      s_pad=((1, 1), (1, 1)), new_state=new_state)
    return y


def _decoder_blocks(params: dict, cfg: VAEConfig, x: jnp.ndarray,
                    state: State, new_state: Dict[str, jnp.ndarray],
                    lo: int, hi: int, first_slice: bool) -> jnp.ndarray:
    """Up blocks [lo, hi) of the decoder (resnets + trailing upsampler)."""
    g = cfg.norm_num_groups
    chans = list(reversed(cfg.block_out_channels))
    n_blocks = len(chans)
    in_ch = chans[lo - 1] if lo > 0 else chans[0]
    for i in range(lo, hi):
        out_ch = chans[i]
        base = f"decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            x = resnet_block(params, f"{base}.resnets.{j}", x, state, new_state,
                             in_ch if j == 0 else out_ch, out_ch, g,
                             cfg.conv_quant)
        in_ch = out_ch
        if i < n_blocks - 1:
            temporal_up = i < cfg.temporal_scale_num
            x = _upsample3d(params, f"{base}.upsamplers.0", x, state, new_state,
                            temporal_up, first_slice)
    return x


def decoder_head(params: dict, cfg: VAEConfig, z: jnp.ndarray,
                 state: State, split: int
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """conv_in + mid block + up blocks [0, split): the part of the decoder
    the split-level tiled decode runs GLOBALLY (exact mid attention and
    group-norm statistics — per-tile approximations only start past the
    split; pipeline_vae.py). Returns the intermediate at spatial scale
    2^min(split, n_blocks-1) and temporal scale per temporal_scale_num."""
    new_state: Dict[str, jnp.ndarray] = {}
    chans = list(reversed(cfg.block_out_channels))
    first_slice = state is None

    if cfg.use_post_quant_conv:
        # 1x1x1 causal conv over the latent (video_vae.py:776-784).
        z = causal_conv3d(params, "post_quant_conv", z, state,
                          new_state=new_state)
    x = causal_conv3d(params, "decoder.conv_in", z, state, t_pad=1,
                      s_pad=((1, 1), (1, 1)), new_state=new_state)
    x = _mid_block(params, "decoder.mid_block", x, state, new_state,
                   chans[0], cfg.norm_num_groups, cfg.conv_quant,
                   attention=cfg.mid_attention)
    x = _decoder_blocks(params, cfg, x, state, new_state, 0, split,
                        first_slice)
    return x, new_state


def decoder_tail(params: dict, cfg: VAEConfig, x: jnp.ndarray,
                 state: State, split: int, first_slice: bool = True
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Up blocks [split, n) + the output norm/conv — the per-tile part of
    the split-level tiled decode. first_slice must mirror the head's
    (state is None) so temporal upsamplers agree on the remove_head drop
    when the split sits below temporal_scale_num."""
    new_state: Dict[str, jnp.ndarray] = {}
    n_blocks = len(cfg.block_out_channels)
    x = _decoder_blocks(params, cfg, x, state, new_state, split, n_blocks,
                        first_slice)
    x = norm_silu_conv(params, "decoder.conv_norm_out", "decoder.conv_out",
                       x, state, new_state, cfg.norm_num_groups,
                       cfg.conv_quant)
    return x, new_state


def decoder_core(params: dict, cfg: VAEConfig, z: jnp.ndarray,
                 state: State) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """z: (B, Tl, h, w, latent) -> (B, T, 8h, 8w, 3). state as encoder_core."""
    first_slice = state is None
    x, ns_head = decoder_head(params, cfg, z, state, 0)
    x, ns_tail = decoder_tail(params, cfg, x, state, 0, first_slice)
    ns_head.update(ns_tail)
    return x, ns_head
