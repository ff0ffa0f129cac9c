"""Fused GroupNorm + SiLU + causal-head extension for the video VAE.

The reference composes these as separate torch ops (causal_norm_wrapper +
SiLU + extend_head, causal_inflation_lib.py:354-439); under XLA that costs
a reduce pass, an elementwise chain, and a full-tensor concat copy for the
temporal head before EVERY causal conv — profiled at ~40% of a 4K decode
tile (docs/performance.md). Here:

 - stats are one jnp read (per-frame group moments, fp32);
 - ONE Pallas pass applies y = silu(x * A + B) (the affine form of
   groupnorm with weight/bias folded: A = inv_std * w, B = b - mean * A)
   and writes the output with the causal head frames PREPENDED — the head
   rows re-read frame 0 through the block index map (clamped), so the
   extend_head concat never materializes.

The kernel handles the hot INITIALIZING path (state=None — every 4n+1
pipeline batch); cross-slice state calls keep the unfused composition.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ns_kernel(x_ref, a_ref, b_ref, o_ref):
    x = x_ref[0, 0].astype(jnp.float32)      # (hb, W, C)
    a = a_ref[0, 0].astype(jnp.float32)      # (1, C)
    b = b_ref[0, 0].astype(jnp.float32)
    y = x * a[None, :, :] + b[None, :, :]
    # round to the storage dtype BEFORE silu, like the unfused
    # frame_group_norm -> silu composition (keeps deep conv stacks
    # numerically consistent); the transcendental runs in f32 (Mosaic has
    # no bf16 logistic)
    y = y.astype(o_ref.dtype).astype(jnp.float32)
    o_ref[0, 0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


@functools.partial(jax.jit, static_argnames=("groups", "eps", "head_frames",
                                             "interpret"))
def norm_silu_head(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                   groups: int, eps: float = 1e-6, head_frames: int = 2,
                   interpret: bool = False) -> jnp.ndarray:
    """x: (B, T, H, W, C) -> (B, T + head_frames, H, W, C) where the first
    `head_frames` frames repeat the processed frame 0 (causal INITIALIZING
    head) and the rest are silu(groupnorm_per_frame(x))."""
    B, T, H, W, C = x.shape
    g = groups
    hp = head_frames

    # per-(b, t, group) moments in one fused read
    xr = x.reshape(B, T, H * W, g, C // g)
    mean = jnp.mean(xr, axis=(2, 4), dtype=jnp.float32)
    meansq = jnp.mean(jnp.square(xr.astype(jnp.float32)), axis=(2, 4))
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)                       # (B, T, g)
    w32 = weight.astype(jnp.float32).reshape(g, C // g)
    b32 = bias.astype(jnp.float32).reshape(g, C // g)
    A = (inv[..., None] * w32).reshape(B, T, 1, C)
    Bc = (b32 - mean[..., None] * inv[..., None] * w32).reshape(B, T, 1, C)

    # block sized by BYTES (a (hb, W, C) bf16 block lives ~4x in VMEM with
    # fp32 temps and double-buffering; 1 MB blocks keep the kernel under
    # the 16 MB scoped-vmem limit at every decoder stage)
    row_bytes = W * C * 2
    hb = _largest_divisor(H, max(1, 1_000_000 // row_bytes))

    out = pl.pallas_call(
        _ns_kernel,
        grid=(B, T + hp, H // hb),
        in_specs=[
            pl.BlockSpec((1, 1, hb, W, C),
                         lambda b, f, h: (b, jnp.maximum(f - hp, 0), h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C),
                         lambda b, f, h: (b, jnp.maximum(f - hp, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, C),
                         lambda b, f, h: (b, jnp.maximum(f - hp, 0), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hb, W, C),
                               lambda b, f, h: (b, f, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T + hp, H, W, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * x.size,
            bytes_accessed=int(x.size * 2 * (2 + hp / max(T, 1))),
            transcendentals=x.size,
        ),
        interpret=interpret,
    )(x, A, Bc)
    return out


def norm_silu_head_reference(x, weight, bias, groups, eps=1e-6,
                             head_frames=2):
    """Unfused jnp composition (the exact old path): per-frame groupnorm ->
    silu -> extend_head. Used on non-TPU backends and as the parity oracle
    for the kernel."""
    from ..models.vae.model import frame_group_norm
    from .layers import silu as _silu

    y = frame_group_norm({"n": {"weight": weight, "b": bias}}, "n", x,
                         groups, eps)
    y = _silu(y)
    head = jnp.repeat(y[:, :1], head_frames, axis=1)
    return jnp.concatenate([head, y], axis=1)
