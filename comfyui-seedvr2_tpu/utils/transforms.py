"""Image/video preprocessing transforms.

Equivalent of the reference pipeline (src/core/generation_utils.py:77-86):
SideResize -> clamp -> DivisiblePad(16) -> Normalize(0.5, 0.5), operating on
channels-last (T, H, W, C) float32 frames in [0, 1].

Resize uses jax.image.resize cubic with antialiasing (the reference uses
torchvision bicubic antialias; kernels differ slightly — documented
divergence, PSNR-irrelevant for upscaling where the resize is an upsample).
"""

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def side_resize_dims(h: int, w: int, size: int, max_size: int = 0,
                     downsample_only: bool = False) -> Tuple[int, int]:
    """Target dims for short-side resize (SideResize semantics:
    src/data/image/transforms/side_resize.py:63-98, torchvision int-truncation
    for the long side, round() for the max-size rescale)."""
    if downsample_only and min(w, h) < size:
        size = min(w, h)
    short, long = (h, w) if h <= w else (w, h)
    new_short = size
    new_long = int(size * long / short)
    nh, nw = (new_short, new_long) if h <= w else (new_long, new_short)
    if max_size > 0 and max(nh, nw) > max_size:
        scale = max_size / max(nh, nw)
        nh, nw = round(nh * scale), round(nw * scale)
    return nh, nw


def area_resize_dims(h: int, w: int, max_area: float,
                     downsample_only: bool = False) -> Tuple[int, int]:
    scale = math.sqrt(max_area / (h * w))
    if downsample_only and scale >= 1:
        scale = 1.0
    return round(h * scale), round(w * scale)


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic, a=-0.5 (PIL/torch antialiased-bicubic convention)."""
    ax = np.abs(x)
    w = np.where(ax <= 1.0, (a + 2) * ax**3 - (a + 3) * ax**2 + 1.0,
                 np.where(ax < 2.0,
                          a * (ax**3 - 5 * ax**2 + 8 * ax - 4.0), 0.0))
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bicubic antialias interpolation matrix (PIL-style window:
    edge pixels clamped by renormalizing over the valid support).

    Resize-as-matmul is the TPU-native formulation: separable dense matmuls
    hit the MXU and compile in milliseconds, unlike the gather-based
    jax.image.resize which takes minutes of XLA compile time at these shapes.
    """
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    support = 2.0 * fscale
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        idx = np.arange(lo, hi, dtype=np.float64)
        w = _cubic_kernel((idx + 0.5 - center) / fscale)
        s = w.sum()
        if s != 0:
            w = w / s
        m[i, lo:hi] = w
    return m


def resize_video(x: jnp.ndarray, nh: int, nw: int) -> jnp.ndarray:
    """Bicubic antialiased resize of (T, H, W, C) frames via separable
    interpolation matrices (see resize_matrix)."""
    h, w = x.shape[1], x.shape[2]
    if (h, w) == (nh, nw):
        return x.astype(jnp.float32)
    mh = jnp.asarray(resize_matrix(h, nh))
    mw = jnp.asarray(resize_matrix(w, nw))
    x32 = x.astype(jnp.float32)
    # HIGHEST keeps resize fp32-exact on TPU (preprocessing feeds the PSNR
    # reference); cost is negligible at preprocessing sizes.
    tmp = jnp.einsum("oh,thwc->towc", mh, x32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,towc->topc", mw, tmp,
                      precision=jax.lax.Precision.HIGHEST)


def divisible_pad(x: jnp.ndarray, factor: int = 16) -> jnp.ndarray:
    """Pad bottom/right with zeros to a multiple of `factor` (lossless;
    DivisiblePad in src/data/image/transforms/divisible_crop.py:36-75)."""
    h, w = x.shape[1], x.shape[2]
    ph = (factor - h % factor) % factor
    pw = (factor - w % factor) % factor
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


def prepare_video(x: jnp.ndarray, resolution: int, max_resolution: int = 0,
                  pad_factor: int = 16) -> jnp.ndarray:
    """Full preprocessing: resize, clamp, pad, normalize to [-1, 1]."""
    h, w = x.shape[1], x.shape[2]
    nh, nw = side_resize_dims(h, w, resolution, max_resolution)
    out = resize_video(x, nh, nw)
    out = jnp.clip(out, 0.0, 1.0)
    out = divisible_pad(out, pad_factor)
    return out * 2.0 - 1.0


def compute_target_dims(h: int, w: int, resolution: int,
                        max_resolution: int = 0) -> Tuple[int, int]:
    """True output dims: resized dims rounded down to even (libx264
    compatibility; generation_utils.py:131-137)."""
    nh, nw = side_resize_dims(h, w, resolution, max_resolution)
    return (nh // 2) * 2, (nw // 2) * 2
