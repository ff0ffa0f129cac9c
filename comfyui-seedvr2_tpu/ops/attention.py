"""Attention primitives.

Replaces the reference's flash_attn_varlen / per-sequence SDPA loop
(src/models/dit_3b/attention.py:24-156). Because the window planner groups
windows into uniform static shapes, attention here is plain dense batched
attention over [batch*windows, seq, heads, head_dim] — no varlen machinery.

Two implementations:
 - `attention_xla`: einsum + fp32 softmax, lets XLA fuse. Reliable baseline.
 - `flash_attention`: Pallas TPU kernel (ops/flash_attention.py) with online
   softmax, used when seq/head dims are MXU-aligned and on TPU backend.
"""

import functools

import jax
import jax.numpy as jnp


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  scale=None, bias=None) -> jnp.ndarray:
    """Dense attention. q: (..., Sq, H, D); k, v: (..., Sk, H, D).
    bias: optional additive logit bias broadcastable to (..., H, Sq, Sk)."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...hqk,...khd->...qhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


@functools.cache
def _flash_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# process-wide attention mode (reference --attention_mode: flash | xla/sdpa).
# Read at trace time; the runner re-asserts it before tracing each denoise
# function and keys its caches on it (core/model_manager.configure_runner).
_DEFAULT_MODE = "flash"


def set_attention_mode(mode: str) -> None:
    global _DEFAULT_MODE
    if mode in ("sdpa", "flash_attn"):  # reference aliases
        mode = "xla" if mode == "sdpa" else "flash"
    assert mode in ("flash", "xla"), mode
    _DEFAULT_MODE = mode


def packed_attention(qkv, heads: int, d: int, cos_q, sin_q, cos_k, sin_k,
                     eps: float, kv_len: int, scale=None):
    """Fully-fused windowed attention over a packed (B, S, 3*H*D) qkv
    projection (S lane-aligned by the caller). qk-norm weights are folded
    into the rope tables; text rope is baked into the table rows. Routes to
    the Pallas kernel on TPU, else an equivalent jnp composition."""
    scale = (d ** -0.5) if scale is None else scale
    if _DEFAULT_MODE == "flash" and _flash_available():
        from .flash_attention import (flash_packed_attention,
                                      flash_packed_supported)

        if flash_packed_supported(qkv.shape[1], heads, d):
            return flash_packed_attention(qkv, heads, d, cos_q, sin_q,
                                          cos_k, sin_k, eps, kv_len, scale)
    b, s, _ = qkv.shape
    x = qkv.reshape(b, s, 3, heads, d)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]

    def norm(z):
        z32 = z.astype(jnp.float32)
        return z32 * jax.lax.rsqrt(
            jnp.mean(z32 * z32, axis=-1, keepdims=True) + eps)

    def rope(z, cos, sin):
        from ..models.dit.rope import rotate_half_full

        c = jnp.asarray(cos, jnp.float32)[:, None, :]
        sn = jnp.asarray(sin, jnp.float32)[:, None, :]
        return z * c + rotate_half_full(z) * sn

    q = rope(norm(q), cos_q, sin_q).astype(qkv.dtype)
    k = rope(norm(k), cos_k, sin_k).astype(qkv.dtype)
    bias = None
    if kv_len < s:
        col = jnp.arange(s)
        bias = jnp.where(col < kv_len, 0.0,
                         -jnp.inf).astype(jnp.float32)[None, None, :]
    out = attention_xla(q, k, v, scale=scale, bias=bias)
    return out.reshape(b, s, heads * d)


def attention(q, k, v, scale=None, use_flash: bool = True,
              rope_cos=None, rope_sin=None, table_ids=None, kv_valid=None,
              kv_len=None):
    """Dispatch to the Pallas flash kernel when profitable, else XLA.

    rope_cos/rope_sin: optional extended rope tables fused into the kernel
    on TPU, applied as a separate fp32 pass on the XLA fallback. Two forms:
     - shared: (S, D), same table for every batch row;
     - per-window: (nU, S, D) deduplicated tables with `table_ids` (B,)
       int32 mapping rows to ids and `kv_valid` (nU, S) bool masking padded
       kv slots (uniform window partition, models/dit/windows.py).

    kv_len: number of REAL kv rows when the caller pre-padded k/v (pad
    columns are softmax-masked on both paths)."""
    if use_flash and _DEFAULT_MODE == "flash" and _flash_available():
        from .flash_attention import (flash_attention, flash_supported,
                                      flash_windowed_attention)

        if flash_supported(q, k, v):
            if table_ids is not None:
                return flash_windowed_attention(
                    q, k, v, scale, rope_cos, rope_sin, table_ids, kv_valid)
            return flash_attention(q, k, v, scale=scale,
                                   rope_cos=rope_cos, rope_sin=rope_sin,
                                   kv_len=kv_len)
    bias = None
    if kv_len is not None and kv_len < k.shape[-3]:
        col = jnp.arange(k.shape[-3])
        bias = jnp.where(col < kv_len, 0.0, -jnp.inf).astype(jnp.float32)
        bias = bias[None, None, :]
    if table_ids is not None:
        from ..models.dit.rope import apply_rope_ext

        ids = jnp.asarray(table_ids)
        cos_b = jnp.asarray(rope_cos)[ids]  # (B, S, D)
        sin_b = jnp.asarray(rope_sin)[ids]
        q = apply_rope_ext(q, cos_b, sin_b)
        k = apply_rope_ext(k, cos_b, sin_b)
        valid = jnp.asarray(kv_valid)[ids]  # (B, Sk) bool
        bias = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
        bias = bias[:, None, None, :]
    elif rope_cos is not None:
        from ..models.dit.rope import apply_rope_ext

        s = q.shape[-3]
        cos, sin = jnp.asarray(rope_cos), jnp.asarray(rope_sin)
        if cos.shape[0] < s:  # identity rows for caller-padded positions
            cos = jnp.pad(cos, ((0, s - cos.shape[0]), (0, 0)),
                          constant_values=1.0)
            sin = jnp.pad(sin, ((0, s - sin.shape[0]), (0, 0)))
        q = apply_rope_ext(q, cos, sin)
        k = apply_rope_ext(k, cos, sin)
    return attention_xla(q, k, v, scale=scale, bias=bias)
