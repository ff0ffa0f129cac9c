"""Run-chunked DMA row gather for static permutations (Pallas TPU).

The NaDiT window permutations (models/dit/windows.py, composed transitions
in models/dit/nadit.py) are gathers of (L, D) token matrices whose index
vectors are concatenations of long contiguous runs (window rows: 11-27
tokens at production shapes). XLA lowers `jnp.take` to a row gather that
runs at ~125 GB/s on v5e; this kernel instead copies whole runs with the
DMA engines, chunked to a fixed row count so every copy has a static shape.

Key trick for expressibility: 2D (L, D) arrays are (8, 128)-tiled in HBM,
so row slices at arbitrary offsets cannot be DMA'd. We view both buffers as
1D (L*D,) and DMA row-aligned 1D slices.

CONSTRAINT (measured on v5e, jax 0.8 Mosaic): 1D HBM memrefs carry a
(1024)-element tiling, so slice offsets must be provably divisible by 1024
("Failed to prove that a tile index in dimension 0 is divisible by the
tiling (1024)"). Row offsets are row*D, so the DMA path is only usable when
D % 1024 == 0 — NaDiT dims (2560/3072/6912) don't qualify, so today
`gather_rows` always falls back to jnp.take for them (~125 GB/s measured).
The kernel stays for lane-dim-aligned models and as the base for a future
revisit (e.g. pairing rows when D % 512 == 0 and run parities allow).

Measured (v5e, D=4096, 16-row runs): the DMA kernel matches jnp.take
exactly (both 68 GB/s r+w) — XLA's row gather is already DMA-bound at these
run lengths, so this path is a wash; it's kept for documentation value and
because the fallback logic makes it free.

Chunking: each run is split into ceil(len/rho) chunks of exactly `rho`
rows; the final chunk of a run is shifted back to end at the run boundary,
overlapping rows that another chunk also writes with byte-identical data
(benign under any DMA interleaving). Requires every run >= rho;
`gather_rows` falls back to jnp.take otherwise (host-side static check —
index vectors are trace-time numpy constants).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_RHO = 8           # rows per chunk
_CHUNKS_PER_PROG = 16


def plan_chunks(idx: np.ndarray, rho: int = _RHO):
    """Split a gather index vector into fixed-size row chunks.

    Returns (src_starts, dst_starts) int32 row offsets, or None if any run
    is shorter than rho (caller should fall back to jnp.take)."""
    idx = np.asarray(idx, np.int64)
    breaks = np.flatnonzero(np.diff(idx) != 1)
    run_starts = np.concatenate([[0], breaks + 1])
    run_lens = np.diff(np.concatenate([run_starts, [len(idx)]]))
    if run_lens.min() < rho:
        return None
    src, dst = [], []
    for s, ln in zip(run_starts, run_lens):
        n = -(-ln // rho)
        for c in range(n):
            off = min(c * rho, ln - rho)
            src.append(idx[s] + off)
            dst.append(s + off)
    return np.asarray(src, np.int32), np.asarray(dst, np.int32)


def _gather_kernel(src_ref, dst_ref, x_ref, o_ref, sem, *, d: int,
                   chunks: int):
    g = pl.program_id(0)
    base = g * chunks
    rho_d = _RHO * d  # chunk length in elements; offsets are row * d
    copies = []
    for c in range(chunks):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(src_ref[base + c] * d, rho_d)],
            o_ref.at[pl.ds(dst_ref[base + c] * d, rho_d)],
            sem,
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()


@functools.partial(jax.jit, static_argnums=(3, 4))
def _gather_call(x1d, src, dst, d: int, out_rows: int):
    kernel = functools.partial(_gather_kernel, d=d,
                               chunks=_CHUNKS_PER_PROG)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(src.shape[0] // _CHUNKS_PER_PROG,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((out_rows * d,), x1d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(src, dst, x1d)


def gather_rows(x: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """x: (..., L, D); idx: static numpy (L2,) -> x[..., idx, :].

    DMA fast path on TPU when the index runs allow it, else jnp.take."""
    d = x.shape[-1]
    # d % 1024: Mosaic 1D HBM tiling constraint (see module docstring)
    use_dma = (jax.default_backend() == "tpu" and d % 1024 == 0
               and not isinstance(idx, jax.core.Tracer))
    chunks = plan_chunks(idx) if use_dma else None
    if chunks is None:
        return jnp.take(x, jnp.asarray(idx), axis=-2)
    src, dst = chunks

    lead = x.shape[:-2]
    L = x.shape[-2]
    L2 = len(idx)
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    # batch rows live at b*L (src) / b*L2 (dst) in the flattened views
    src = (src[None, :] + (np.arange(B, dtype=np.int64) * L)[:, None]).reshape(-1)
    dst = (dst[None, :] + (np.arange(B, dtype=np.int64) * L2)[:, None]).reshape(-1)
    pad = (-len(src)) % _CHUNKS_PER_PROG
    if pad:  # repeat the last chunk; duplicate writes carry identical data
        src = np.concatenate([src, np.repeat(src[-1:], pad)])
        dst = np.concatenate([dst, np.repeat(dst[-1:], pad)])
    out = _gather_call(x.reshape(-1), jnp.asarray(src, jnp.int32),
                       jnp.asarray(dst, jnp.int32), d, B * L2)
    return out.reshape(*lead, L2, d)
