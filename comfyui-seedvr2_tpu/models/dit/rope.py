"""Rotary position embeddings for NaDiT, precomputed at trace time.

The reference computes RoPE frequency tables on-device per forward with an
lru-cached `get_axial_freqs` (src/models/dit_3b/rope.py:43-46,130-177 and
dit_7b/rope.py:61-100). On TPU we hoist the whole computation to plan time:
cos/sin tables are numpy constants baked into the jitted function, and the
in-kernel work is two fused multiplies (fp32, matching the reference's
`.float()` islands at rope.py:118-127).

Two flavors:
 - 3B "mmrope3d": lang-style freqs (theta=10000), per-axis dim = rope_dim//3,
   video positions offset by the text length along the temporal axis
   (text occupies temporal slots [0, l), video [l, l+f)), text uses the 1D
   temporal table tiled x3.
 - 7B per-window "rope3d": pixel-style freqs (linspace(1, max_freq/2)*pi) with
   positions linspace(-1, 1, axis_len); no text rope, no offset.

Rotation is interleaved-pair (rotate_half on (d 2) pairs), applied to the
first `rot_dim` channels of each head; the remainder passes through.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _lang_freqs(dim_per_axis: int, theta: float = 10000.0) -> np.ndarray:
    exponents = np.arange(0, dim_per_axis, 2, dtype=np.float64)[: dim_per_axis // 2]
    return (1.0 / (theta ** (exponents / dim_per_axis))).astype(np.float64)


def _pixel_freqs(dim_per_axis: int, max_freq: float = 256.0) -> np.ndarray:
    n = dim_per_axis // 2
    return (np.linspace(1.0, max_freq / 2, n, dtype=np.float64) * np.pi)


def _axis_table(pos: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    """(len,) positions x (n,) freqs -> (len, 2n) interleaved-duplicated."""
    table = np.outer(pos.astype(np.float64), freqs)
    return np.repeat(table, 2, axis=-1)


def _axial_concat(tables) -> np.ndarray:
    """Broadcast per-axis (d_i, f_i) tables over the grid and concat freqs."""
    dims = [t.shape[0] for t in tables]
    out = []
    for i, t in enumerate(tables):
        shape = [1] * len(dims) + [t.shape[-1]]
        shape[i] = dims[i]
        out.append(np.broadcast_to(t.reshape(shape), dims + [t.shape[-1]]))
    return np.concatenate(out, axis=-1)


def mmrope3d_video_table(window_shape: Tuple[int, int, int], txt_len: int,
                         rope_dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """3B video cos/sin for one window shape, (window_len, rot_dim) fp32."""
    f, h, w = window_shape
    per_axis = rope_dim // 3
    freqs = _lang_freqs(per_axis)
    t_tab = _axis_table(np.arange(txt_len, txt_len + f), freqs)
    h_tab = _axis_table(np.arange(h), freqs)
    w_tab = _axis_table(np.arange(w), freqs)
    full = _axial_concat([t_tab, h_tab, w_tab]).reshape(f * h * w, -1)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def mmrope3d_text_table(txt_len: int, rope_dim: int):
    """3B text cos/sin: 1D temporal table tiled x3 (rope.py:173)."""
    per_axis = rope_dim // 3
    freqs = _lang_freqs(per_axis)
    tab = _axis_table(np.arange(txt_len), freqs)
    full = np.tile(tab, (1, 3))
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def rope3d_pixel_table(window_shape: Tuple[int, int, int], rope_dim: int,
                       max_freq: float = 256.0):
    """7B per-window cos/sin, positions linspace(-1, 1) per axis."""
    per_axis = rope_dim // 3

    def pos(n):
        return np.linspace(-1.0, 1.0, n) if n > 1 else np.zeros((1,)) - 1.0

    freqs = _pixel_freqs(per_axis, max_freq)
    tabs = [_axis_table(pos(d), freqs) for d in window_shape]
    full = _axial_concat(tabs).reshape(int(np.prod(window_shape)), -1)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def extend_tables(cos: np.ndarray, sin: np.ndarray, head_dim: int,
                  extra_rows: int = 0):
    """Extend (S, rot) tables to (S + extra_rows, head_dim) with identity
    (cos=1, sin=0) in the padded dims/rows. With identity entries, applying
    rotation full-width is a no-op there — this lets the flash kernel rope
    video tokens and pass text/pad tokens through with one table."""
    s, rot = cos.shape
    cos_e = np.ones((s + extra_rows, head_dim), np.float32)
    sin_e = np.zeros((s + extra_rows, head_dim), np.float32)
    cos_e[:s, :rot] = cos
    sin_e[:s, :rot] = sin
    return cos_e, sin_e


def embed_window_table(cos_r: np.ndarray, sin_r: np.ndarray,
                       wshape: Tuple[int, int, int],
                       win_info, head_dim: int, txt_len: int):
    """Embed a real sub-window's (rlen, rot) table into a padded uniform
    window (windows.py UniformPlan): real rows land at their padded slots
    (slot_start offsets for front-clipped shifted windows), identity rows
    (cos=1, sin=0) everywhere else — pad slots are masked kv / cropped q,
    and the trailing txt_len identity rows pass the appended text tokens
    through unrotated (3B text is pre-rotated separately)."""
    wt, wh, ww = wshape
    wlen = wt * wh * ww
    cos_e = np.ones((wlen + txt_len, head_dim), np.float32)
    sin_e = np.zeros((wlen + txt_len, head_dim), np.float32)
    (rt, st), (rh, sh), (rw, sw) = win_info
    it = (st + np.arange(rt))[:, None, None]
    ih = (sh + np.arange(rh))[None, :, None]
    iw = (sw + np.arange(rw))[None, None, :]
    flat = ((it * wh + ih) * ww + iw).reshape(-1)
    rot = cos_r.shape[-1]
    cos_e[flat, :rot] = cos_r.reshape(len(flat), rot)
    sin_e[flat, :rot] = sin_r.reshape(len(flat), rot)
    return cos_e, sin_e


def rotate_half_full(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotate-half over the full last dim (must be even)."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    return jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(x.shape)


def apply_rope_ext(x: jnp.ndarray, cos_e, sin_e) -> jnp.ndarray:
    """Full-width rotation with extended tables. x: (..., S, H, D);
    cos_e/sin_e: (S, D) fp32 (identity rows/dims pass through)."""
    x32 = x.astype(jnp.float32)
    c = jnp.asarray(cos_e)[..., :, None, :]
    s = jnp.asarray(sin_e)[..., :, None, :]
    return (x32 * c + rotate_half_full(x32) * s).astype(x.dtype)


def apply_rope(x: jnp.ndarray, cos: Optional[jnp.ndarray],
               sin: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Rotate the leading `rot_dim` channels of x.

    Args:
        x: (..., S, heads, head_dim)
        cos/sin: (S, rot_dim) fp32 tables (rot_dim even, <= head_dim).
    """
    if cos is None:
        return x
    rot = cos.shape[-1]
    x_rot = x[..., :rot].astype(jnp.float32)
    x_pass = x[..., rot:]
    # rotate_half on interleaved pairs: (x0, x1) -> (-x1, x0)
    xr = x_rot.reshape(*x_rot.shape[:-1], rot // 2, 2)
    half = jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(x_rot.shape)
    c = cos[..., :, None, :]  # (S, 1, rot) broadcasting over heads
    s = sin[..., :, None, :]
    rotated = (x_rot * c + half * s).astype(x.dtype)
    return jnp.concatenate([rotated, x_pass], axis=-1)
