"""Fused dequant-matmul Pallas kernel for Q8_0-quantized weights.

The reference dequantizes GGUF weights on every forward inside wrapped Linear
modules (src/optimization/gguf_ops.py:34-196). The TPU-native serving path
instead keeps Q8_0 weights as int8 + per-32-group scales in HBM and fuses
dequantization into the matmul's K-loop: weight HBM traffic is halved vs
bf16, and the dequant (VPU) overlaps the MXU dot.

Storage layout (all lane-tileable on TPU):
  q:      (K, N) int8   — matmul-ready (x @ w orientation)
  scales: (K // 32, N) float32 — GGUF Q8_0 block axis runs along K
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, acc, *, n_k: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[:].astype(jnp.float32)          # (bk, bn)
    s = s_ref[:].astype(jnp.float32)          # (bk // GROUP, bn)
    bk, bn = q.shape
    w = (q.reshape(bk // GROUP, GROUP, bn) * s[:, None, :]).reshape(bk, bn)
    acc[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret", "out_dtype"))
def quant_matmul_q8(x: jnp.ndarray, q: jnp.ndarray, scales: jnp.ndarray,
                    block_m: int = 256, block_n: int = 512,
                    block_k: int = 512, interpret: bool = False,
                    out_dtype=None):
    """x: (M, K) bf16; q: (K, N) int8; scales: (K//32, N) -> (M, N) x.dtype
    (or out_dtype — fp32 keeps the accumulator exact for a cross-chip psum
    of K-sharded partials, parallel/tp.py)."""
    out_dtype = out_dtype or x.dtype
    m, k = x.shape
    n = q.shape[1]
    assert q.shape[0] == k and scales.shape == (k // GROUP, n)
    if not interpret and jax.default_backend() != "tpu":
        # dense emulation for CPU correctness runs / virtual-device meshes
        return jnp.dot(x.astype(jnp.float32), dequantize_q8(q, scales),
                       preferred_element_type=jnp.float32).astype(out_dtype)

    block_m = min(block_m, _round_up(m, 8))
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    n_pad = _round_up(n, block_n)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n)))
        scales = jnp.pad(scales, ((0, 0), (0, n_pad - n)))
    k_pad = _round_up(k, block_k)
    if k_pad != k:
        x = jnp.pad(x, ((0, 0), (0, k_pad - k)))
        q = jnp.pad(q, ((0, k_pad - k), (0, 0)))
        scales = jnp.pad(scales, ((0, (k_pad - k) // GROUP), (0, 0)))

    n_k = k_pad // block_k
    grid = (m_pad // block_m, n_pad // block_n, n_k)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // GROUP, block_n),
                         lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=(x.size * 2 + q.size + scales.size * 4
                            + m_pad * n_pad * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, scales)
    return out[:m, :n]


def _aqmm_kernel(x_ref, q_ref, s_ref, m_ref, o_ref, acc, *, n_k: int):
    """Affine-grouped fused dequant-matmul: w = s*q - m per 32-group along K
    (the native Q4_K/Q5_K reconstruction, gguf_dequant.py:171-330 —
    reference dequantizes to fp16 first; here the affine form stays packed
    and the min term folds into a tiny (M, K/32) @ (K/32, N) side-dot:
    x @ (s*q - m) = x @ (s*q) - group_sums(x) @ m."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:].astype(jnp.float32)          # (bm, bk)
    q = q_ref[:].astype(jnp.float32)          # (bk, bn) raw quants (>= 0)
    s = s_ref[:].astype(jnp.float32)          # (bk // GROUP, bn)
    m = m_ref[:].astype(jnp.float32)          # (bk // GROUP, bn)
    bk, bn = q.shape
    w = (q.reshape(bk // GROUP, GROUP, bn) * s[:, None, :]).reshape(bk, bn)
    acc[:] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    bm = x.shape[0]
    xg = x.reshape(bm, bk // GROUP, GROUP).sum(axis=2)
    acc[:] -= jax.lax.dot_general(
        xg, m, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret", "out_dtype"))
def quant_matmul_affine(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                        m: jnp.ndarray, block_m: int = 256,
                        block_n: int = 512, block_k: int = 512,
                        interpret: bool = False, out_dtype=None):
    """x: (M, K); q: (K, N) int8 raw quants; s, m: (K//32, N) f32 affine
    per-group scale/min -> (M, N) x.dtype (or out_dtype — fp32 for
    tp psum of K-sharded partials). Serves GGUF K-quants natively
    (no requantization error on top of the q4 grid)."""
    out_dtype = out_dtype or x.dtype
    mm, k = x.shape
    n = q.shape[1]
    assert q.shape[0] == k and s.shape == (k // GROUP, n) and m.shape == s.shape
    if not interpret and jax.default_backend() != "tpu":
        w = (q.astype(jnp.float32).reshape(k // GROUP, GROUP, n)
             * s[:, None, :] - m[:, None, :]).reshape(k, n)
        return jnp.dot(x.astype(jnp.float32), w,
                       preferred_element_type=jnp.float32).astype(out_dtype)

    block_m = min(block_m, _round_up(mm, 8))
    m_pad = _round_up(mm, block_m)
    if m_pad != mm:
        x = jnp.pad(x, ((0, m_pad - mm), (0, 0)))
    n_pad = _round_up(n, block_n)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n)))
        s = jnp.pad(s, ((0, 0), (0, n_pad - n)))
        m = jnp.pad(m, ((0, 0), (0, n_pad - n)))
    k_pad = _round_up(k, block_k)
    if k_pad != k:
        x = jnp.pad(x, ((0, 0), (0, k_pad - k)))
        q = jnp.pad(q, ((0, k_pad - k), (0, 0)))
        s = jnp.pad(s, ((0, (k_pad - k) // GROUP), (0, 0)))
        m = jnp.pad(m, ((0, (k_pad - k) // GROUP), (0, 0)))

    n_k = k_pad // block_k
    grid = (m_pad // block_m, n_pad // block_n, n_k)
    out = pl.pallas_call(
        functools.partial(_aqmm_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // GROUP, block_n),
                         lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // GROUP, block_n),
                         lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=(x.size * 2 + q.size + s.size * 8
                            + m_pad * n_pad * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, s, m)
    return out[:mm, :n]


def quantize_q8(w: jnp.ndarray):
    """Weight (K, N) in x@w orientation -> (q int8 (K, N),
    scales f32 (K//32, N)). GGUF Q8_0 convention: scale = absmax/127 per
    32-group along K."""
    k, n = w.shape
    w32 = jnp.asarray(w, jnp.float32).reshape(k // GROUP, GROUP, n)
    absmax = jnp.max(jnp.abs(w32), axis=1)
    scales = absmax / 127.0
    inv = jnp.where(scales > 0, 1.0 / scales, 0.0)
    q = jnp.clip(jnp.round(w32 * inv[:, None, :]), -127, 127).astype(jnp.int8)
    return q.reshape(k, n), scales


def dequantize_q8(q: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    k, n = q.shape
    return (q.astype(jnp.float32).reshape(k // GROUP, GROUP, n)
            * scales[:, None, :]).reshape(k, n)


def quantize_affine4(w: jnp.ndarray):
    """Weight (K, N) -> 4-bit affine serving layout (q int8 (K, N) in
    [0, 15], s f32 (K//32, N), m f32 (K//32, N)) with w ~= q*s - m per
    32-group along K — the same layout GGUF Q4_K lands in at load
    (loader.py native_kquants), so PTQ int4 trees serve through the
    identical `quant_matmul_affine` kernel. Matches the K-quant grid
    itself but not the reference Q4_K's additional 6-bit scale/min
    quantization (gguf_dequant.py Q4_K), so this bounds the affine
    SERVING path's error, slightly tighter than a real Q4_K file."""
    k, n = w.shape
    w32 = jnp.asarray(w, jnp.float32).reshape(k // GROUP, GROUP, n)
    mn = jnp.min(w32, axis=1)
    mx = jnp.max(w32, axis=1)
    s = (mx - mn) / 15.0
    inv = jnp.where(s > 0, 1.0 / s, 0.0)
    q = jnp.clip(jnp.round((w32 - mn[:, None, :]) * inv[:, None, :]),
                 0, 15).astype(jnp.int8)
    return q.reshape(k, n), s, -mn


def quantize_dit_params_affine4(params: dict, min_dim: int = 1024) -> dict:
    """Post-training 4-bit affine quantization of a DiT parameter tree:
    every linear "w" with both dims >= min_dim becomes {"qa", "s", "m"}
    (the native K-quant serving format, affine_quant_linear). Small/IO
    projections stay dense, mirroring the published GGUF checkpoints."""

    def convert(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                w = node["w"]
                k, n = w.shape
                if min(k, n) >= min_dim and k % GROUP == 0:
                    qa, s, m = quantize_affine4(w)
                    out = {"qa": qa, "s": s, "m": m}
                    if "b" in node:
                        out["b"] = node["b"]
                    return out
            return {k: convert(v) for k, v in node.items()}
        if isinstance(node, list):
            return [convert(v) for v in node]
        return node

    return convert(params)


def quantize_dit_params(params: dict, min_dim: int = 1024) -> dict:
    """Post-training Q8_0 quantization of a DiT parameter tree: every linear
    "w" with both dims >= min_dim becomes {"q8", "scales"} (the fused-kernel
    serving format). Small/IO projections stay dense, mirroring the published
    GGUF checkpoints which keep sensitive layers in fp16."""

    def convert(node):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                w = node["w"]
                k, n = w.shape
                if min(k, n) >= min_dim and k % GROUP == 0:
                    q, s = quantize_q8(w)
                    out = {"q8": q, "scales": s}
                    if "b" in node:
                        out["b"] = node["b"]
                    return out
            return {k: convert(v) for k, v in node.items()}
        if isinstance(node, list):
            return [convert(v) for v in node]
        return node

    return convert(params)


def quant_linear(x: jnp.ndarray, p: dict, psum_axis=None) -> jnp.ndarray:
    """linear() counterpart for quantized params {"q8", "scales", "b"?}.
    x: (..., K).

    psum_axis: row-sharded tensor parallelism (parallel/tp.py) — the local
    K-slice partial comes out of the kernel in fp32, is psum'd over the
    named mesh axis, and rounds to x.dtype once, so the bias (replicated)
    applies exactly once after the reduction."""
    batch_shape = x.shape[:-1]
    k = x.shape[-1]
    out = quant_matmul_q8(x.reshape(-1, k), p["q8"], p["scales"],
                          out_dtype=jnp.float32 if psum_axis else None)
    if psum_axis is not None:
        out = jax.lax.psum(out, psum_axis)
    out = out.astype(x.dtype).reshape(*batch_shape, -1)
    if "b" in p and p["b"] is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def affine_quant_linear(x: jnp.ndarray, p: dict,
                        psum_axis=None) -> jnp.ndarray:
    """linear() counterpart for native K-quant params {"qa", "s", "m",
    "b"?} (Q4_K/Q5_K served without requantization). x: (..., K).
    psum_axis: see quant_linear."""
    batch_shape = x.shape[:-1]
    k = x.shape[-1]
    out = quant_matmul_affine(x.reshape(-1, k), p["qa"], p["s"], p["m"],
                              out_dtype=jnp.float32 if psum_axis else None)
    if psum_axis is not None:
        out = jax.lax.psum(out, psum_axis)
    out = out.astype(x.dtype).reshape(*batch_shape, -1)
    if "b" in p and p["b"] is not None:
        out = out + p["b"].astype(out.dtype)
    return out
