"""Pallas TPU flash attention (online-softmax) for windowed dense attention.

Kernel strategy: grid over (batch*heads, q-blocks); for each q block the
kernel streams k/v blocks from VMEM with a running (m, l, acc) online-softmax
state, accumulating in fp32 on the MXU. Sequence padding to the block size is
handled with a static mask (pad lengths are known at trace time thanks to the
static window plans), so no scalar prefetch is needed.

This replaces flash_attn_varlen_func of the reference
(src/models/dit_3b/attention.py:66-95) — varlen is unnecessary here because
the window planner (models/dit/windows.py) emits uniform shape groups.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_MAX_KV_VMEM = 8192  # max padded kv length kept fully VMEM-resident


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_supported(q, k, v) -> bool:
    d = q.shape[-1]
    sk = k.shape[-3]
    return d % _LANE == 0 and d <= 512 and _round_up(sk, _LANE) <= _MAX_KV_VMEM


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
               block_k: int, num_k_blocks: int):
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, d)
    bq, d = q.shape

    m = jnp.full((bq, 1), -jnp.inf, dtype=jnp.float32)
    l = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc = jnp.zeros((bq, d), dtype=jnp.float32)

    for kb in range(num_k_blocks):
        kblk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        vblk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kblk.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        if (kb + 1) * block_k > kv_len:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1
            )
            s = jnp.where(col < kv_len, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p, vblk.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(q, k, v, scale=None):
    """q: (..., Sq, H, D); k, v: (..., Sk, H, D) -> (..., Sq, H, D).

    Pads sequence dims to lane multiples; the kv pad is masked inside the
    kernel, the q pad rows are sliced off afterwards.
    """
    d = q.shape[-1]
    h = q.shape[-2]
    sq, sk = q.shape[-3], k.shape[-3]
    scale = (d ** -0.5) if scale is None else scale
    batch_shape = q.shape[:-3]

    def to3d(x, s):
        x = x.reshape((-1, s, h, d)).transpose(0, 2, 1, 3)  # (B, H, S, D)
        return x.reshape((-1, s, d))

    q3, k3, v3 = to3d(q, sq), to3d(k, sk), to3d(v, sk)

    sq_pad = _round_up(sq, _LANE)
    sk_pad = _round_up(sk, _LANE)
    if sq_pad != sq:
        q3 = jnp.pad(q3, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        k3 = jnp.pad(k3, ((0, 0), (0, sk_pad - sk), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, sk_pad - sk), (0, 0)))

    block_q = min(512, sq_pad)
    # ensure divisibility
    while sq_pad % block_q:
        block_q //= 2
    block_k = _LANE

    # closure over the true kv length for masking
    def run(q3, k3, v3):
        bh = q3.shape[0]
        num_k_blocks = sk_pad // block_k
        kernel = functools.partial(
            _fa_kernel, scale=scale, kv_len=sk, block_k=block_k,
            num_k_blocks=num_k_blocks,
        )
        return pl.pallas_call(
            kernel,
            grid=(bh, sq_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * sq_pad * sk_pad * d,
                bytes_accessed=(q3.size + k3.size + v3.size) * 2,
                transcendentals=bh * sq_pad * sk_pad,
            ),
        )(q3, k3, v3)

    out = run(q3, k3, v3)
    out = out[:, :sq]
    out = out.reshape((-1, h, sq, d)).transpose(0, 2, 1, 3)
    return out.reshape((*batch_shape, sq, h, d))
