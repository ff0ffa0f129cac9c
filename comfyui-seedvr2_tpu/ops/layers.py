"""Elementwise / normalization / linear building blocks (pure jnp).

Matches the reference numerics:
 - rms_norm: fp32 statistics like CustomRMSNorm
   (src/models/dit_3b/normalization.py:71-110): x / sqrt(mean(x^2) + eps).
 - layer_norm: F.layer_norm semantics (fp32 stats).
 - gelu_tanh / silu / swiglu as in src/models/dit_3b/mlp.py.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, eps: float = 1e-5,
             weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * jax.lax.rsqrt(var + eps)
    out = out.astype(x.dtype)
    if weight is not None:
        out = out * weight.astype(x.dtype)
    return out


def layer_norm(x: jnp.ndarray, eps: float = 1e-5,
               weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out.astype(x.dtype)
    if weight is not None:
        out = out * weight.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def group_norm(x: jnp.ndarray, num_groups: int, eps: float = 1e-6,
               weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """GroupNorm over channels-last input (..., C), stats per group over all
    non-batch axes. Caller is responsible for which axes are 'spatial': here
    x is (B, *spatial, C) and stats reduce over *spatial and within-group C."""
    b = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(b, -1, g, c // g)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.var(x32, axis=(1, 3), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = out.reshape(b, *spatial, c).astype(x.dtype)
    if weight is not None:
        out = out * weight.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def linear(x: jnp.ndarray, p: dict,
           psum_axis: Optional[str] = None) -> jnp.ndarray:
    """x @ w + b with fp32 accumulation on the MXU.

    p: {"w": (in, out), "b"?} for dense weights, or
    {"q8": (in, out) int8, "scales": (in/32, out), "b"?} for Q8_0 weights
    (routes through the fused dequant-matmul Pallas kernel), or
    {"w8a8": (in, out) int8, "ws": (out,) f32, "b"?} for the int8-MXU
    serving mode (per-token dynamic activation quantization).

    psum_axis: for row-sharded tensor parallelism (parallel/tp.py) — the
    local partial product is psum'd in fp32 over the named mesh axis
    BEFORE the dtype round and the bias, so precision matches single-chip
    and the bias is applied exactly once. Supported by every weight
    layout (dense, w8a8, q8, qa).

    x may be an ops.fused_quant.PreQuantized (pre-quantized activations
    from a fused producer kernel) — valid only with w8a8 weights."""
    if "w8a8" in p:
        from .int8_matmul import w8a8_linear

        return w8a8_linear(x, p["w8a8"], p["ws"], bias=p.get("b"),
                           psum_axis=psum_axis)
    if isinstance(x, tuple):
        raise TypeError("PreQuantized input requires w8a8 weights")
    if "q8" in p:
        from .quant_matmul import quant_linear

        return quant_linear(x, p, psum_axis=psum_axis)
    if "qa" in p:  # native K-quant (Q4_K/Q5_K) affine serving layout
        from .quant_matmul import affine_quant_linear

        return affine_quant_linear(x, p, psum_axis=psum_axis)
    acc = jnp.dot(x, p["w"].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    if psum_axis is not None:
        # psum the fp32 partials: each chip's K-slice product must keep its
        # accumulator precision across the reduction, matching the
        # single-chip result to reduction order. Rounding to bf16 BEFORE
        # the psum loses mantissa bits per partial and compounds per layer
        # (~1% pixel error at 2 chips on the tiny oracle).
        acc = jax.lax.psum(acc, psum_axis)
    out = acc.astype(x.dtype)
    if "b" in p and p["b"] is not None:
        out = out + p["b"].astype(x.dtype)
    return out


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def mlp_forward(x: jnp.ndarray, p: dict, mlp_type: str,
                psum_axis: Optional[str] = None) -> jnp.ndarray:
    """psum_axis: tensor-parallel mode — proj_in* are column-sharded (their
    bias slices live with the columns), proj_out is row-sharded and psum'd
    (parallel/tp.py)."""
    if mlp_type == "swiglu":
        if "w8a8" in p["proj_in_gate"] and "w8a8" in p["proj_in"]:
            from .fused_quant import silu_mul_quantize
            from .int8_matmul import w8a8_double_linear

            g, u = w8a8_double_linear(x, p["proj_in_gate"], p["proj_in"])
            if "w8a8" in p["proj_out"]:
                # fused silu*up + per-row quantize: one read of g/u, int8
                # write — replaces XLA's separate absmax/round passes
                return linear(silu_mul_quantize(g, u), p["proj_out"],
                              psum_axis=psum_axis)
            return linear(silu(g) * u, p["proj_out"], psum_axis=psum_axis)
        return linear(silu(linear(x, p["proj_in_gate"])) * linear(x, p["proj_in"]),
                      p["proj_out"], psum_axis=psum_axis)
    return linear(gelu_tanh(linear(x, p["proj_in"])), p["proj_out"],
                  psum_axis=psum_axis)


def swiglu_hidden_dim(dim: int, expand_ratio: int, multiple_of: int = 256) -> int:
    hidden = int(2 * dim * expand_ratio / 3)
    return multiple_of * ((hidden + multiple_of - 1) // multiple_of)
