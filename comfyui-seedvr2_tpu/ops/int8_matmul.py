"""w8a8 int8 matmul (Pallas TPU): int8 x int8 -> int32 MXU accumulation.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), so for the
serving path we quantize weights per-output-channel and activations
per-token at runtime and accumulate in int32:

    out[m, n] = (sum_k xq[m, k] * wq[k, n]) * xs[m] * ws[n]

This goes beyond the reference's GGUF path (which dequantizes Q8 blocks to
fp16/bf16 and runs fp16 matmuls on the GPU — ComfyUI-SeedVR2
src/optimization/gguf_dequant.py): on TPU the dequant-to-bf16 matmul is
already fused (ops/quant_matmul.py), and w8a8 additionally halves the MXU
time. Accuracy guardrails live in tests/test_w8a8.py.

Layouts: xq (M, K) int8, wq (K, N) int8 (transposed at quantization time,
so the kernel contracts the leading K axis like every other linear here),
xs (M, 1) fp32, ws (1, N) fp32.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm_kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = (acc_ref[...].astype(jnp.float32)
                      * xs_ref[...] * ws_ref[...]).astype(o_ref.dtype)


def _block_div(dim: int, target: int, quantum: int = 256) -> int:
    """Largest divisor of `dim` that is a multiple of `quantum` and
    <= target (or the smallest such divisor if none fit under target)."""
    divs = [d for d in range(quantum, dim + 1, quantum) if dim % d == 0]
    assert divs, (dim, quantum)
    under = [d for d in divs if d <= target]
    return max(under) if under else min(divs)


def int8_matmul(xq: jnp.ndarray, wq: jnp.ndarray, xs: jnp.ndarray,
                ws: jnp.ndarray, out_dtype=jnp.bfloat16,
                block_m: int = 1024, block_n: int = 512,
                block_k: int = 2560, interpret: bool = False) -> jnp.ndarray:
    """xq (M, K) i8 @ wq (K, N) i8, scaled by xs (M,) f32 and ws (N,) f32.

    Defaults tuned on v5e at DiT shapes (M=64.8k, K=2560, N=7680):
    full-K blocks with a tall M block reach 250 TOP/s — past the 197 TF/s
    bf16 roofline, confirming the int8 MXU path (394 TOPS peak)."""
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2, (xq.shape, wq.shape)
    if not interpret and jax.default_backend() != "tpu":
        # exact emulation (int32 accumulation) for CPU correctness runs
        acc = jax.lax.dot_general(
            xq.astype(jnp.int32), wq.astype(jnp.int32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs[:, None].astype(jnp.float32)
                * ws[None, :].astype(jnp.float32)).astype(out_dtype)
    # prefer an M block that divides M exactly (int8 sublane tile = 32) —
    # padding 64800 -> 65536 costs a pad + slice of the full activation per
    # call, which profiling showed eats a third of the int8 win
    if m % 32 == 0:
        block_m = _block_div(m, block_m, quantum=32)
        m_pad = m
    else:
        m_pad = _round_up(m, block_m)
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
        xs = jnp.pad(xs, (0, m_pad - m))
    # full dims prefer 256-quantum blocks (tuned); tp-local shards that are
    # an odd multiple of 128 (e.g. mlp hidden 6912 over 2 chips -> 3456)
    # fall back to the 128 lane tile
    assert k % 128 == 0 and n % 128 == 0, "weight dims must be lane-tileable"
    block_k = _block_div(k, block_k, quantum=256 if k % 256 == 0 else 128)
    block_n = _block_div(n, block_n, quantum=256 if n % 256 == 0 else 128)

    out = pl.pallas_call(
        _mm_kernel,
        grid=(m_pad // block_m, n // block_n, k // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k + k * n + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, wq, xs.reshape(-1, 1).astype(jnp.float32),
      ws.reshape(1, -1).astype(jnp.float32))
    return out[:m]


def _mm_qx_kernel(x_ref, w_ref, ws_ref, o_ref, xq_ref, xs_ref):
    """Quantizing int8 matmul: bf16 activations in, per-row int8 quantization
    done once per M block (j == 0) into VMEM scratch, then int8 MXU dots
    against every N block. Removes the separate XLA quantize pass (a full
    read+write of the activation per linear)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quantize():
        # row-chunked so the fp32 temporaries stay ~32*K*4 bytes on the
        # VMEM stack (a whole-block astype(f32) blew the 16M scoped limit)
        bm = x_ref.shape[0]
        r0 = 0
        while r0 < bm:
            step = min(32, bm - r0)
            x = x_ref[pl.ds(r0, step), :].astype(jnp.float32)
            amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
            scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
            xq_ref[pl.ds(r0, step), :] = jnp.clip(
                jnp.round(x * (1.0 / scale)), -127, 127).astype(jnp.int8)
            xs_ref[pl.ds(r0, step), :] = scale
            r0 += step

    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (acc.astype(jnp.float32) * xs_ref[...]
                  * ws_ref[...]).astype(o_ref.dtype)


def int8_matmul_qx(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
                   out_dtype=None, block_m: int = 512,
                   block_n: int = 512, interpret: bool = False) -> jnp.ndarray:
    """bf16/f32 x (M, K) @ int8 wq (K, N) with in-kernel per-row activation
    quantization (full-K blocks; K must fit VMEM alongside the scratch)."""
    m, k = x.shape
    k2, n = wq.shape
    assert k == k2
    out_dtype = x.dtype if out_dtype is None else out_dtype
    # VMEM budget: the bf16 x block + int8 scratch are K wide (full rows);
    # cap block_m so 3*K bytes/row stays ~6 MB (leaves room for w/out
    # double-buffering), rounded to the int8 sublane tile
    block_m = min(block_m, max(32, ((4 << 20) // (3 * k)) // 32 * 32))
    # the int8 weight block is double-buffered: keep k * block_n under ~2 MB
    block_n = min(block_n, max(256, ((2 << 20) // k) // 256 * 256))
    if m % 32 == 0:
        block_m = _block_div(m, block_m, quantum=32)
        m_pad = m
    else:
        m_pad = _round_up(m, block_m)
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    block_n = _block_div(n, block_n)

    out = pl.pallas_call(
        _mm_qx_kernel,
        grid=(m_pad // block_m, n // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, k), jnp.int8),
                        pltpu.VMEM((block_m, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k * 2 + k * n + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wq, ws.reshape(1, -1).astype(jnp.float32))
    return out[:m]


def quantize_activations(x: jnp.ndarray):
    """Per-row symmetric int8: (..., K) -> ((..., K) i8, (...,) f32 scales)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.squeeze(-1)


def quantize_weight_w8a8(w):
    """(K, N) float kernel -> ((K, N) i8, (N,) f32 per-channel scales).

    Device-resident jax Arrays quantize ON DEVICE with jnp (lazy, no
    transfer); anything else (checkpoint tensors on host) goes through
    numpy so loading uploads the int8 tree — half the bytes of bf16 —
    instead of round-tripping float weights. Through the dev tunnel
    (15-30 MB/s) the wrong choice costs minutes per model."""
    import numpy as np

    if isinstance(w, jnp.ndarray) and not isinstance(w, np.ndarray):
        w32 = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(w32), axis=0)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127)
        return q.astype(jnp.int8), scale
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=0)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_dit_params_w8a8(params: dict, min_dim: int = 1024,
                             align: int = 256) -> dict:
    """Post-training w8a8 conversion of a DiT parameter tree: every linear
    "w" with both dims >= min_dim (and lane-tileable: K and N multiples of
    `align`, the v5e int8 tile; tests shrink it with tiny configs) becomes
    {"w8a8": (K, N) i8, "ws": (N,) f32}. Small/IO projections stay dense,
    like the published GGUF checkpoints. Q8_0 trees ({"q8", "scales"}) are
    requantized per-channel (block scales folded in first)."""
    import numpy as np

    from .quant_matmul import dequantize_q8

    def convert(node):
        if isinstance(node, dict):
            w = None
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                w = node["w"]  # stays device-side if it is a jax Array
            elif "q8" in node:
                w = np.asarray(dequantize_q8(node["q8"], node["scales"]),
                               np.float32)
            if w is not None:
                k, n = w.shape
                if min(k, n) >= min_dim and k % align == 0 and n % align == 0:
                    q, s = quantize_weight_w8a8(w)
                    out = {"w8a8": jnp.asarray(q), "ws": jnp.asarray(s)}
                    if "b" in node:
                        out["b"] = node["b"]
                    return out
                if "q8" in node:  # leave unconverted q8 as-is
                    return node
            return {k2: convert(v) for k2, v in node.items()}
        if isinstance(node, list):
            return [convert(v) for v in node]
        return node

    return convert(params)


def _w8a8_matmul_2d(x2d, wq, ws, interpret: bool):
    """Explicit quantize + int8 matmul. Measured on v5e (3B 4K step): the
    fused in-kernel variant (int8_matmul_qx) runs 2.52 s vs 2.40 s for this
    two-step path — holding full-K bf16 rows + int8 scratch in VMEM forces
    M blocks small enough (<=480 vs 864) that the MXU loss outweighs the
    saved quantize pass. qx stays for narrow-K models where the cap doesn't
    bind."""
    xq, xs = quantize_activations(x2d)
    return int8_matmul(xq, wq, xs, ws, out_dtype=x2d.dtype,
                       interpret=interpret)


def w8a8_linear(x, wq: jnp.ndarray, ws: jnp.ndarray,
                bias=None, interpret: bool = False,
                psum_axis=None) -> jnp.ndarray:
    """Drop-in linear: quantize activations per token, int8 MXU matmul.

    x may be a float array OR an ops.fused_quant.PreQuantized (activations
    already int8 from a fused producer kernel — skips the quantize pass).

    psum_axis: row-sharded tensor parallelism (parallel/tp.py). Each chip
    quantizes its LOCAL K-slice per token (a finer scale grid than the
    single-chip full-K absmax — equal-or-lower quantization error), the
    fp32-scaled partials psum over the axis, and the replicated bias
    applies once after the reduction."""
    from .fused_quant import PreQuantized

    out_dtype = jnp.float32 if psum_axis is not None else None
    if isinstance(x, PreQuantized):
        lead = x.q.shape[:-1]
        k = x.q.shape[-1]
        out = int8_matmul(x.q.reshape(-1, k), wq, x.s.reshape(-1), ws,
                          out_dtype=out_dtype or x.dtype, interpret=interpret)
        res_dtype = x.dtype
    else:
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2d = x.reshape(-1, k)
        if psum_axis is not None:
            xq, xs = quantize_activations(x2d)
            out = int8_matmul(xq, wq, xs, ws, out_dtype=jnp.float32,
                              interpret=interpret)
        else:
            out = _w8a8_matmul_2d(x2d, wq, ws, interpret)
        res_dtype = x.dtype
    if psum_axis is not None:
        out = jax.lax.psum(out, psum_axis).astype(res_dtype)
    out = out.reshape(*lead, wq.shape[1])
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def w8a8_double_linear(x, p_a: dict, p_b: dict,
                       interpret: bool = False):
    """Two w8a8 linears sharing one input (swiglu gate + up): quantize the
    activations once and run a single fused (K, Na+Nb) int8 matmul. The
    weight concat is a per-call copy of int8 constants (~13 MB at 3B MLP
    size — negligible next to the saved full-activation quantize pass).
    x may be a PreQuantized from a fused producer (see w8a8_linear)."""
    from .fused_quant import PreQuantized

    na = p_a["w8a8"].shape[1]
    wq = jnp.concatenate([p_a["w8a8"], p_b["w8a8"]], axis=1)
    ws = jnp.concatenate([p_a["ws"], p_b["ws"]])
    if isinstance(x, PreQuantized):
        lead = x.q.shape[:-1]
        k = x.q.shape[-1]
        out = int8_matmul(x.q.reshape(-1, k), wq, x.s.reshape(-1), ws,
                          out_dtype=x.dtype, interpret=interpret)
    else:
        lead = x.shape[:-1]
        k = x.shape[-1]
        out = _w8a8_matmul_2d(x.reshape(-1, k), wq, ws, interpret)
    out = out.reshape(*lead, -1)
    a, b = out[..., :na], out[..., na:]
    if p_a.get("b") is not None and "b" in p_a:
        a = a + p_a["b"].astype(a.dtype)
    if p_b.get("b") is not None and "b" in p_b:
        b = b + p_b["b"].astype(b.dtype)
    return a, b
