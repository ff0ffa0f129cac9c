"""Color correction: LAB / wavelet / wavelet_adaptive / HSV / AdaIN.

JAX ports of the reference methods (src/utils/color_fix.py). All functions
take channels-last video tensors (T, H, W, C) in [-1, 1] and are static-shape
jit-friendly, with fp32 internal math (the reference's
ensure_float32_precision islands).

TPU notes vs the reference:
 - exact sort-based histogram matching is kept for the LAB channels (full
   sorts are static-shape and cheap on TPU);
 - the HSV hue-conditional matching uses mask-weighted 1024-bin CDFs instead
   of boolean-mask extraction (dynamic shapes don't exist under XLA); this is
   numerically equivalent to the reference up to bin quantization.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------ adain --


def adaptive_instance_normalization(content: jnp.ndarray,
                                    style: jnp.ndarray) -> jnp.ndarray:
    """Per-frame channel mean/std transfer (color_fix.py:94-120).

    content/style: (T, H, W, C); statistics per (frame, channel)."""
    eps = 1e-5

    def stats(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        return mean, jnp.sqrt(var + eps)

    c_mean, c_std = stats(content)
    s_mean, s_std = stats(style)
    out = (content.astype(jnp.float32) - c_mean) / c_std * s_std + s_mean
    return out.astype(content.dtype)


# ---------------------------------------------------------------- wavelet --

_KERNEL = np.array([[0.0625, 0.125, 0.0625],
                    [0.125, 0.25, 0.125],
                    [0.0625, 0.125, 0.0625]], dtype=np.float32)


def wavelet_blur(image: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Dilated 3x3 Gaussian-ish blur, replicate padding (color_fix.py:122-160).
    image: (T, H, W, C)."""
    h, w = image.shape[1:3]
    max_safe = max(1, min(h, w) // 8)
    radius = min(radius, max_safe)
    c = image.shape[-1]
    kernel = jnp.asarray(_KERNEL)[:, :, None, None] * jnp.eye(c, dtype=jnp.float32)
    x = jnp.pad(image.astype(jnp.float32),
                ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                mode="edge")
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=1 if c == 1 else 1,
    )
    return out.astype(image.dtype)


def wavelet_decomposition(image: jnp.ndarray,
                          levels: int = 5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    high = jnp.zeros_like(image, dtype=jnp.float32)
    img = image.astype(jnp.float32)
    low = img
    for i in range(levels):
        low = wavelet_blur(img, 2 ** i).astype(jnp.float32)
        high = high + img - low
        img = low
    return high, low


@functools.partial(jax.jit)
def wavelet_reconstruction(content: jnp.ndarray,
                           style: jnp.ndarray) -> jnp.ndarray:
    """Content high frequencies + style low frequencies (color_fix.py:188-248)."""
    c_high, _ = wavelet_decomposition(content)
    _, s_low = wavelet_decomposition(style)
    out = jnp.clip(c_high + s_low, -1.0, 1.0)
    return out.astype(content.dtype)


# -------------------------------------------------------------------- lab --

_RGB2XYZ = np.array([[0.4124564, 0.3575761, 0.1804375],
                     [0.2126729, 0.7151522, 0.0721750],
                     [0.0193339, 0.1191920, 0.9503041]], dtype=np.float32)
_XYZ2RGB = np.array([[3.2404542, -1.5371385, -0.4985314],
                     [-0.9692660, 1.8760108, 0.0415560],
                     [0.0556434, -0.2040259, 1.0572252]], dtype=np.float32)
_EPS = 6.0 / 29.0
_KAPPA = (29.0 / 3.0) ** 3
_D65 = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def _rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W, 3) in [0,1] -> LAB channels stacked on last axis."""
    lin = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    # HIGHEST: full-fp32 matmul on TPU (default bf16 passes visibly shift hue)
    xyz = jnp.matmul(lin, jnp.asarray(_RGB2XYZ).T,
                     precision=jax.lax.Precision.HIGHEST)
    xyz = xyz / jnp.asarray(_D65)
    f = jnp.where(xyz > _EPS ** 3, jnp.cbrt(xyz), (xyz * _KAPPA + 16.0) / 116.0)
    L = f[..., 1] * 116.0 - 16.0
    a = (f[..., 0] - f[..., 1]) * 500.0
    b = (f[..., 1] - f[..., 2]) * 200.0
    return jnp.stack([L, a, b], axis=-1)


def _lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = fy - b / 200.0

    def inv(f):
        return jnp.where(f > _EPS, f ** 3, (f * 116.0 - 16.0) / _KAPPA)

    xyz = jnp.stack([inv(fx), inv(fy), inv(fz)], axis=-1) * jnp.asarray(_D65)
    lin = jnp.matmul(xyz, jnp.asarray(_XYZ2RGB).T,
                     precision=jax.lax.Precision.HIGHEST)
    rgb = jnp.where(lin > 0.0031308,
                    jnp.clip(lin, 0.0) ** (1.0 / 2.4) * 1.055 - 0.055,
                    lin * 12.92)
    return jnp.clip(rgb, 0.0, 1.0)


def _histogram_match(source: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """Exact sort-based CDF matching over the full tensor
    (color_fix.py:473-512)."""
    shape = source.shape
    src = source.reshape(-1)
    ref = reference.reshape(-1)
    src_sorted_idx = jnp.argsort(src)
    ref_sorted = jnp.sort(ref)
    n_src, n_ref = src.shape[0], ref.shape[0]
    if n_src == n_ref:
        matched_sorted = ref_sorted
    else:
        q = jnp.linspace(0.0, 1.0, n_src)
        idx = jnp.clip((q * (n_ref - 1)).astype(jnp.int32), 0, n_ref - 1)
        matched_sorted = ref_sorted[idx]
    out = jnp.zeros_like(src).at[src_sorted_idx].set(matched_sorted)
    return out.reshape(shape)


@functools.partial(jax.jit, static_argnames=("luminance_weight",))
def lab_color_transfer(content: jnp.ndarray, style: jnp.ndarray,
                       luminance_weight: float = 0.8) -> jnp.ndarray:
    """Wavelet base + LAB a*/b* histogram matching + weighted L
    (color_fix.py:251-471). content/style: (T, H, W, 3) in [-1, 1]."""
    content = wavelet_reconstruction(content, style).astype(jnp.float32)
    style = style.astype(jnp.float32)

    c01 = jnp.clip((content + 1.0) * 0.5, 0.0, 1.0)
    s01 = jnp.clip((style + 1.0) * 0.5, 0.0, 1.0)
    c_lab = _rgb_to_lab(c01)
    s_lab = _rgb_to_lab(s01)

    matched_a = _histogram_match(c_lab[..., 1], s_lab[..., 1])
    matched_b = _histogram_match(c_lab[..., 2], s_lab[..., 2])
    if luminance_weight < 1.0:
        matched_l = _histogram_match(c_lab[..., 0], s_lab[..., 0])
        out_l = c_lab[..., 0] * luminance_weight + matched_l * (1.0 - luminance_weight)
    else:
        out_l = c_lab[..., 0]

    out = _lab_to_rgb(jnp.stack([out_l, matched_a, matched_b], axis=-1))
    return (out * 2.0 - 1.0).astype(content.dtype)


# -------------------------------------------------------------------- hsv --


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    rangec = maxc - minc
    safe = jnp.where(rangec > 1e-10, rangec, 1.0)
    h = jnp.where(
        (maxc == r) & (rangec > 1e-10), ((g - b) / safe) % 6.0,
        jnp.where((maxc == g) & (rangec > 1e-10), (b - r) / safe + 2.0,
                  jnp.where((maxc == b) & (rangec > 1e-10),
                            (r - g) / safe + 4.0, 0.0)))
    h = h / 6.0
    s = jnp.where(maxc > 1e-10, rangec / jnp.clip(maxc, 1e-10), 0.0)
    return jnp.stack([h, s, maxc], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h).astype(jnp.int32) % 6
    f = h - jnp.floor(h)
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, q, v])
    return jnp.stack([r, g, b], axis=-1)


_NUM_HUE_BINS = 12
_NUM_CDF_BINS = 1024
_MIN_PIXELS = 100


def _masked_cdf_match(src_vals, src_mask, ref_vals, ref_mask):
    """Histogram-match src within mask to ref within mask via binned CDFs.

    Static-shape replacement for boolean-mask extraction: builds 1024-bin
    weighted CDFs on [0,1] and maps each source value through
    ref_quantile(src_cdf(value))."""
    edges = jnp.linspace(0.0, 1.0, _NUM_CDF_BINS + 1)

    def cdf_of(vals, mask):
        idx = jnp.clip((vals * _NUM_CDF_BINS).astype(jnp.int32), 0,
                       _NUM_CDF_BINS - 1)
        hist = jnp.zeros((_NUM_CDF_BINS,), jnp.float32).at[idx.reshape(-1)].add(
            mask.reshape(-1).astype(jnp.float32))
        total = jnp.clip(jnp.sum(hist), 1.0)
        return jnp.cumsum(hist) / total

    src_cdf = cdf_of(src_vals, src_mask)
    ref_cdf = cdf_of(ref_vals, ref_mask)

    # for each source value: q = src_cdf(bin(v)); output = ref_cdf^{-1}(q)
    idx = jnp.clip((src_vals * _NUM_CDF_BINS).astype(jnp.int32), 0,
                   _NUM_CDF_BINS - 1)
    q = src_cdf[idx]
    inv_idx = jnp.searchsorted(ref_cdf, q)
    inv_idx = jnp.clip(inv_idx, 0, _NUM_CDF_BINS - 1)
    matched = (inv_idx.astype(jnp.float32) + 0.5) / _NUM_CDF_BINS
    return matched


@functools.partial(jax.jit)
def hsv_saturation_histogram_match(content: jnp.ndarray,
                                   style: jnp.ndarray) -> jnp.ndarray:
    """Hue-conditional saturation matching (color_fix.py:515-640):
    12 hue bins, saturation CDF matched per bin, H/V preserved."""
    c01 = jnp.clip((content.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    s01 = jnp.clip((style.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    c_hsv = _rgb_to_hsv(c01)
    s_hsv = _rgb_to_hsv(s01)
    ch, cs, cv = c_hsv[..., 0], c_hsv[..., 1], c_hsv[..., 2]
    sh, ss = s_hsv[..., 0], s_hsv[..., 1]

    bin_w = 1.0 / _NUM_HUE_BINS
    matched = cs
    for b in range(_NUM_HUE_BINS):
        lo, hi = b * bin_w, (b + 1) * bin_w
        if b == 0:  # red wrap-around
            c_mask = ((ch >= 0) & (ch < hi)) | (ch >= 1.0 - bin_w)
            s_mask = ((sh >= 0) & (sh < hi)) | (sh >= 1.0 - bin_w)
        else:
            c_mask = (ch >= lo) & (ch < hi)
            s_mask = (sh >= lo) & (sh < hi)
        enough = (jnp.sum(c_mask) > _MIN_PIXELS) & (jnp.sum(s_mask) > _MIN_PIXELS)
        m = _masked_cdf_match(cs, c_mask, ss, s_mask)
        matched = jnp.where(c_mask & enough, m, matched)

    out = _hsv_to_rgb(jnp.stack([ch, matched, cv], axis=-1))
    out = jnp.clip(out, 0.0, 1.0) * 2.0 - 1.0
    return out.astype(content.dtype)


# ------------------------------------------------------- wavelet adaptive --


def _saturation_map(x: jnp.ndarray) -> jnp.ndarray:
    rgb = jnp.clip((x.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    maxc = jnp.max(rgb, axis=-1, keepdims=True)
    minc = jnp.min(rgb, axis=-1, keepdims=True)
    return jnp.where(maxc > 1e-10, (maxc - minc) / jnp.clip(maxc, 1e-10), 0.0)


@functools.partial(jax.jit)
def wavelet_adaptive_color_correction(content: jnp.ndarray,
                                      style: jnp.ndarray) -> jnp.ndarray:
    """Wavelet base + HSV correction blended into oversaturated regions only
    (color_fix.py:762-860)."""
    content32 = content.astype(jnp.float32)
    style32 = style.astype(jnp.float32)
    wave = wavelet_reconstruction(content32, style32).astype(jnp.float32)
    hsv = hsv_saturation_histogram_match(content32, style32).astype(jnp.float32)

    c_sat = _saturation_map(content32)
    s_sat = _saturation_map(style32)
    w_sat = _saturation_map(wave)

    threshold, sharpness = 0.15, 5.0
    blend = jax.nn.sigmoid(sharpness * ((c_sat - s_sat) - threshold))
    still_over = ((w_sat - s_sat) > threshold * 0.5).astype(jnp.float32)
    blend = jnp.clip(blend * still_over, 0.0, 1.0)

    out = wave * (1.0 - blend) + hsv * blend
    return out.astype(content.dtype)


def apply_color_correction(method: str, sample: jnp.ndarray,
                           reference: jnp.ndarray) -> jnp.ndarray:
    """Dispatch used by phase 4. sample/reference: (T, H, W, 3) in [-1, 1]."""
    if method == "lab":
        return lab_color_transfer(sample, reference)
    if method == "wavelet":
        return wavelet_reconstruction(sample, reference)
    if method == "wavelet_adaptive":
        return wavelet_adaptive_color_correction(sample, reference)
    if method == "hsv":
        return hsv_saturation_histogram_match(sample, reference)
    if method == "adain":
        return adaptive_instance_normalization(sample, reference)
    if method == "none":
        return sample
    raise ValueError(f"unknown color correction method: {method}")
