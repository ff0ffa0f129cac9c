"""Fused activation-quantize producers for the w8a8 serving mode.

The w8a8 path (ops/int8_matmul.py) quantizes every matmul input per-row at
trace level: XLA runs it as read-y/absmax + read-y/round-write passes over
a bf16 tensor that the producer fusion just wrote — ~4 full HBM passes per
linear on top of the producer's own read. For the DiT the producers are
known and tiny in math: rms_norm + AdaSingle modulation feeding qkv/mlp-in
(models/dit/nadit.py:_block_forward), and silu(gate)*up feeding the mlp
proj_out. These kernels fuse producer + row-absmax + quantize into ONE
read of the bf16 input and one (half-size) int8 write, emitting exactly
the (q, scales) pair ops/int8_matmul.int8_matmul consumes.

Reference match: the modulated-norm producers are the reference's
AdaSingle/mlp pre-norms (src/models/dit_3b/modulation.py:26-49,
mmsr_block.py:84-128); the quantization itself has no reference
counterpart (the reference serves fp8/GGUF via dequant-to-bf16 — this is
the TPU int8-MXU lane, SURVEY.md §7.3.6).

All producer math runs in fp32 inside the kernel (the unfused path
rounds the normed tensor to bf16 before modulating, so the fused path is
slightly MORE accurate than what it replaces; both feed an int8 rounding
anyway). Non-TPU backends use a pure-jnp fallback with identical fp32
semantics so tests and CPU meshes agree with interpret mode.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PreQuantized(NamedTuple):
    """Per-row int8 activations + scales, accepted by ops.layers.linear and
    the w8a8 helpers in place of a float array. `dtype` is the float dtype
    the matmul output should come back in."""

    q: jnp.ndarray        # (..., K) int8
    s: jnp.ndarray        # (...,) f32 per-row scales
    dtype: jnp.dtype      # static: output dtype for the consuming matmul

    @property
    def shape(self):
        return self.q.shape


def _block_rows(m: int, target: int) -> int:
    """Largest divisor of m that is a multiple of 32 and <= target."""
    divs = [d for d in range(32, m + 1, 32) if m % d == 0]
    under = [d for d in divs if d <= target]
    return max(under) if under else min(divs)


def _quant_rows(y32):
    amax = jnp.max(jnp.abs(y32), axis=-1, keepdims=True)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y32 / sc), -127, 127).astype(jnp.int8)
    return q, sc


def _rms_ada_q_kernel(x_ref, s_ref, t_ref, q_ref, xs_ref, *, eps):
    x32 = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = (x32 * jax.lax.rsqrt(var + eps)) * s_ref[...] + t_ref[...]
    q, sc = _quant_rows(y)
    q_ref[...] = q
    xs_ref[...] = sc


def _rms_ada_q_2d(x, scale, shift, eps, block_m, interpret):
    m, k = x.shape
    bl = _block_rows(m, block_m)
    q, s = pl.pallas_call(
        partial(_rms_ada_q_kernel, eps=eps),
        grid=(m // bl,),
        in_specs=[
            pl.BlockSpec((bl, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bl, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * m * k, transcendentals=m,
            bytes_accessed=m * k * 3,
        ),
        interpret=interpret,
    )(x, scale.reshape(1, k).astype(jnp.float32),
      shift.reshape(1, k).astype(jnp.float32))
    return q, s[:, 0]


def rms_ada_quantize(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
                     eps: float = 1e-5, block_m: int = 512,
                     interpret: bool = False) -> PreQuantized:
    """quantize(rms_norm(x) * scale + shift) in one HBM pass.

    x: (B, L, K) float; scale/shift: (B, K) — the AdaSingle row params with
    the per-channel tables already added (trace-level (B, K) add). Returns
    PreQuantized with q (B, L, K) int8 and s (B, L) f32."""
    b, l, k = x.shape
    if (not interpret and jax.default_backend() != "tpu") or l % 32 or k % 256:
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = (x32 * jax.lax.rsqrt(var + eps)) * scale[:, None, :].astype(
            jnp.float32) + shift[:, None, :].astype(jnp.float32)
        q, sc = _quant_rows(y)
        return PreQuantized(q, sc[..., 0], x.dtype)
    qs = [_rms_ada_q_2d(x[i], scale[i], shift[i], eps, block_m, interpret)
          for i in range(b)]
    return PreQuantized(jnp.stack([q for q, _ in qs]),
                        jnp.stack([s for _, s in qs]), x.dtype)


def _silu_mul_q_kernel(g_ref, u_ref, q_ref, xs_ref):
    g32 = g_ref[...].astype(jnp.float32)
    y = jax.nn.silu(g32) * u_ref[...].astype(jnp.float32)
    q, sc = _quant_rows(y)
    q_ref[...] = q
    xs_ref[...] = sc


def silu_mul_quantize(g: jnp.ndarray, u: jnp.ndarray, block_m: int = 128,
                      interpret: bool = False) -> PreQuantized:
    """quantize(silu(g) * u) in one read of each operand — the swiglu
    mlp's proj_out producer. g, u: (B, L, Kh)."""
    b, l, k = g.shape
    if (not interpret and jax.default_backend() != "tpu") or l % 32 or k % 256:
        y = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32))
        q, sc = _quant_rows(y)
        return PreQuantized(q, sc[..., 0], g.dtype)

    def one(gi, ui):
        m = l
        bl = _block_rows(m, block_m)
        q, s = pl.pallas_call(
            _silu_mul_q_kernel,
            grid=(m // bl,),
            in_specs=[
                pl.BlockSpec((bl, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bl, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bl, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bl, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m, k), jnp.int8),
                jax.ShapeDtypeStruct((m, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=6 * m * k, transcendentals=m * k,
                bytes_accessed=m * k * 5,
            ),
            interpret=interpret,
        )(gi, ui)
        return q, s[:, 0]

    qs = [one(g[i], u[i]) for i in range(b)]
    return PreQuantized(jnp.stack([q for q, _ in qs]),
                        jnp.stack([s for _, s in qs]), g.dtype)
