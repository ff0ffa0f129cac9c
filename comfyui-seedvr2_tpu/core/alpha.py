"""Edge-guided alpha channel upscaling (RGBA inputs).

JAX port of src/core/alpha_upscaling.py: Sobel edge detection, box-filter
guided filter (avg_pool semantics incl. zero padding, matching
F.avg_pool2d(count_include_pad=True)), bicubic base upscale, and the
binary-mask refinement cascade (tight transition zones, sigmoid contrast,
mid-gray snapping). The binary-vs-gradient decision (95% threshold on
near-0/1 pixels) is made host-side; both branches are static-shape jnp.

Layout: channels-last (T, H, W, C) throughout (the reference uses TCHW).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
_SOBEL_Y = _SOBEL_X.T
_GRAY = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def _resize_alpha(alpha, h_out, w_out):
    """Bicubic antialias upscale via the matrix-resize path (transforms)."""
    from ..utils.transforms import resize_video

    return resize_video(alpha, h_out, w_out)


def _conv2d_single(x: jnp.ndarray, kernel: np.ndarray,
                   padding: str = "REFLECT") -> jnp.ndarray:
    """Depthwise 3x3 conv on (T, H, W, 1) with reflect-101 border (cv2)."""
    k = jnp.asarray(kernel)[:, :, None, None]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def detect_edges(rgb01: jnp.ndarray) -> jnp.ndarray:
    """Sobel edge magnitude of (T, H, W, 3) in [0,1] -> (T, H, W, 1) in [0,1],
    normalized by the global max (alpha_upscaling.py:125-170)."""
    gray = (rgb01 @ jnp.asarray(_GRAY))[..., None] * 255.0
    gx = _conv2d_single(gray, _SOBEL_X)
    gy = _conv2d_single(gray, _SOBEL_Y)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return mag / jnp.clip(jnp.max(mag), 1e-6)


def _box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """avg_pool2d(kernel=2r+1, stride=1, pad=r, count_include_pad=True)."""
    k = 2 * r + 1
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (r, r), (r, r), (0, 0)])
    return summed / float(k * k)


def guided_filter(guide_rgb01: jnp.ndarray, src: jnp.ndarray,
                  radius: int, eps: float) -> jnp.ndarray:
    """He et al. guided filter with grayscale guide
    (alpha_upscaling.py:191-288)."""
    guide = jnp.mean(guide_rgb01, axis=-1, keepdims=True)
    mean_g = _box_filter(guide, radius)
    mean_s = _box_filter(src, radius)
    corr_g = _box_filter(guide * guide, radius)
    corr_gs = _box_filter(guide * src, radius)
    var_g = corr_g - mean_g * mean_g
    cov_gs = corr_gs - mean_g * mean_s
    a = cov_gs / (var_g + eps)
    b = mean_s - a * mean_g
    return _box_filter(a, radius) * guide + _box_filter(b, radius)


@functools.partial(jax.jit, static_argnames=("h_out", "w_out"))
def _binary_path(alpha_in, rgb01_up, h_out, w_out):
    t = alpha_in.shape[0]
    base = jnp.clip(_resize_alpha(alpha_in, h_out, w_out), 0.0, 1.0)
    refined = guided_filter(rgb01_up, base, radius=2, eps=0.002)
    edges = detect_edges(rgb01_up)
    transition = jax.lax.reduce_window(
        edges, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    solid_threshold = 0.05
    is_solid = transition < solid_threshold
    alpha_binary = (refined > 0.5).astype(jnp.float32)
    contrast = jax.nn.sigmoid((refined - 0.5) * 12.0)
    edge_strength = jnp.clip(edges / 0.25, 0.0, 1.0)
    in_edges = refined * (1 - edge_strength) + contrast * edge_strength
    combined = jnp.where(is_solid, alpha_binary, in_edges)
    very_solid = transition < 0.03
    combined = jnp.where(very_solid, (combined > 0.5).astype(jnp.float32),
                         combined)
    mid_gray = (combined > 0.3) & (combined < 0.7)
    should_bin = mid_gray & ~(edges > 0.15)
    out = jnp.where(should_bin, (combined > 0.5).astype(jnp.float32), combined)
    return jnp.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("h_out", "w_out"))
def _gradient_path(alpha_in, rgb01_up, h_out, w_out):
    t = alpha_in.shape[0]
    base = jnp.clip(_resize_alpha(alpha_in, h_out, w_out), 0.0, 1.0)
    out = guided_filter(rgb01_up, base, radius=3, eps=0.002)
    return jnp.clip(out, 0.0, 1.0)


def edge_guided_alpha_upscale(input_alpha: np.ndarray,
                              upscaled_rgb: np.ndarray) -> np.ndarray:
    """input_alpha: (T, H_in, W_in, 1) in [0,1]; upscaled_rgb:
    (T, H_out, W_out, 3) in [-1,1] or [0,1]. Returns (T, H_out, W_out, 1)."""
    t, h_out, w_out, _ = upscaled_rgb.shape
    rgb01 = upscaled_rgb.astype(np.float32)
    if rgb01.min() < 0:
        rgb01 = (rgb01 + 1.0) / 2.0

    flat = input_alpha.reshape(-1)
    binary_ratio = ((flat < 0.1).sum() + (flat > 0.9).sum()) / flat.size
    fn = _binary_path if binary_ratio > 0.95 else _gradient_path
    out = fn(jnp.asarray(input_alpha, jnp.float32),
             jnp.asarray(rgb01, jnp.float32), h_out, w_out)
    return np.asarray(jax.device_get(out))


def process_alpha_for_batch(rgb_upscaled: np.ndarray, alpha_original: np.ndarray,
                            rgb_original: np.ndarray) -> np.ndarray:
    """Phase-4 entry: upscale the batch's alpha to match the upscaled RGB
    (alpha_upscaling.py:18-122). All channels-last.

    KNOWN REFERENCE MISALIGNMENT (kept bug-for-bug, do not "fix" only
    here): under temporal overlap the decoded batch drops its first
    `overlap` frames during blending, but alpha_original is the UNTRIMMED
    per-batch alpha — so alpha frame k pairs with RGB frame k+overlap.
    The reference does the same (generation_phases.py:1141-1199 slices
    final_video[write_start:write_end] against the untrimmed alpha). Any
    fix must shift both sides together or output parity breaks."""
    t = rgb_upscaled.shape[0]
    return edge_guided_alpha_upscale(alpha_original[:t], rgb_upscaled)
