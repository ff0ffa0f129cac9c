"""int8 3D convolution for the video VAE — shifted-matmul Pallas kernel.

XLA's TPU conv runs int8 inputs at bf16 rate (measured 1.03x, docs/
performance.md), so the int8 MXU's 2x peak (394 TOPS on v5e) is only
reachable with a custom kernel. A 3x3x3 conv is 27 shifted 1x1 convs:

    out[t, h, w] = sum_{dt,dh,dw} x[t+dt, h+dh, w+dw] @ W[dt, dh, dw]

Kernel design (per grid step (t, h-block, co-block)):
 - the (3, hb+2, Wp, C) input window is DMA'd from HBM once per (t, h)
   (halos are not expressible as BlockSpec blocks; the co-innermost grid
   reuses the window across co-blocks via @pl.when(co == 0));
 - the two dw!=0 shifts are hoisted: TWO sublane rolls of the whole window
   instead of a shuffle per tap (the v1 per-tap variant measured 95 TOP/s
   — shuffle-bound);
 - W is padded to the int8 sublane tile (32) so the (hb, Wp, C) ->
   (hb*Wp, C) operand merge is layout-free;
 - 27 (hb*Wp, C) @ (C, co_block) int8 matmuls accumulate in int32 VMEM;
   the epilogue dequantizes acc * x_scale[t] * w_scale[co] -> bf16.

Quantization: per-tensor activation scale (the tap window spans 3 frames,
so finer-than-window scales would need per-dt accumulators), per-output-
channel weight scales. Accuracy in tests/test_int8_conv.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 32  # int8 sublane tile


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _conv_kernel(xs_ref, x_hbm, w_ref, ws_ref, o_ref, acc, win, wcat,
                 sem, *, hb: int, wb: int, wq: int, C: int, cob: int,
                 n_h: int, n_w: int, n_steps: int):
    """Software-pipelined over a 2D (row-block, col-block) spatial grid:
    two window slots; while program (t, h, j) computes from slot step%2,
    the DMA for the next step fills the other. win: (2, 3, hb+2, wq, C)
    int8 with wq = wb + 32 (2 halo cols rounded to the int8 sublane tile);
    sem: (2,) DMA semaphores.

    The dw taps are folded into the contraction: wcat (hb+2, wq, 3C) holds
    [x, x<<1, x<<2] (width rolls) concatenated on the lane dim, so each
    (dt, dh) pair is ONE (hb*wq, 3C) @ (3C, cob) matmul — 9 deep matmuls
    per step instead of 27 shallow ones. Blocking W (not just H) is what
    buys hb >= 4: v2 kept full-width windows plus per-dw rotation buffers,
    whose VMEM forced hb=1 — single-row M=Wp matmuls at K=C were
    per-issue-overhead-bound (91-142 TOP/s). The wcat build costs
    ~3x(hb+2)/(9*hb) VPU-copied bytes per MXU flop, MXU-dominated from
    hb ~ 6."""
    t = pl.program_id(0)
    hblk = pl.program_id(1)
    wblk = pl.program_id(2)
    co = pl.program_id(3)
    step = (t * n_h + hblk) * n_w + wblk
    slot = jax.lax.rem(step, 2)

    def start_copy(s, slot_idx):
        ts = s // (n_h * n_w)
        rem = jax.lax.rem(s, n_h * n_w)
        hs = rem // n_w
        ws = jax.lax.rem(rem, n_w)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(ts, 3), pl.ds(hs * hb, hb + 2),
                     pl.ds(ws * wb, wq)],
            win.at[slot_idx], sem.at[slot_idx]).start()

    @pl.when(co == 0)
    def _load():
        @pl.when(step == 0)
        def _():
            start_copy(0, 0)

        @pl.when(step + 1 < n_steps)
        def _():
            start_copy(step + 1, jax.lax.rem(step + 1, 2))

        pltpu.make_async_copy(
            x_hbm.at[pl.ds(t, 3), pl.ds(hblk * hb, hb + 2),
                     pl.ds(wblk * wb, wq)],
            win.at[slot], sem.at[slot]).wait()

    res = jnp.zeros_like(acc)
    for dt in range(3):
        # rebuilt per (dt, co): wcat holds one dt-frame; the rebuild for
        # co > 0 (Co=512 stage only) is VPU copies, small next to the
        # 9 deep matmuls it feeds. Shifted slabs are written with offset
        # stores (no jnp.concatenate: its stack temporaries tipped the
        # 16 MB scoped-vmem limit at the C=128 full-res stage).
        frame = win[slot, dt]                              # (hb+2, wq, C)
        wcat[:, :, :C] = frame
        wcat[:, :wq - 1, C:2 * C] = frame[:, 1:]
        wcat[:, wq - 1:, C:2 * C] = jnp.zeros_like(frame[:, :1])
        wcat[:, :wq - 2, 2 * C:] = frame[:, 2:]
        wcat[:, wq - 2:, 2 * C:] = jnp.zeros_like(frame[:, :2])

        for dh in range(3):
            a = wcat[dh:dh + hb].reshape(hb * wq, 3 * C)
            res = res + jax.lax.dot_general(
                a, w_ref[dt * 3 + dh],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    scale = xs_ref[t] * ws_ref[0, :]                       # (cob,)
    out = res.astype(jnp.float32) * scale[None, :]
    o_ref[0] = out.reshape(hb, wq, cob)[:, :wb].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hb", "cob", "interpret"))
def int8_conv3d(x_ext: jnp.ndarray, w: jnp.ndarray, x_scales: jnp.ndarray,
                w_scales: jnp.ndarray, hb: int = 8, cob: int = 128,
                interpret: bool = False) -> jnp.ndarray:
    """x_ext: (T+2, H+2, Wp, C) int8 — temporally extended, spatially
    zero-padded input with Wp = round_up(W+2, 32) (batch folded by the
    caller); w: (27, C, Co) int8; x_scales: (T,) f32 per-output-frame
    scales; w_scales: (Co,) f32. Returns (T, H, W, Co) bf16 with
    W = Wp - 2 output columns... W is inferred as the conv-valid width
    (Wp_unpadded - 2); the caller passes the true W via the padded layout:
    out width = Wp - 2 is cropped to the caller's target by slicing."""
    Tp, Hp, Wp, C = x_ext.shape
    T, H = Tp - 2, Hp - 2
    W = Wp - 2
    Co = w.shape[-1]
    assert w.shape == (27, C, Co)
    assert Wp % _SUBLANE == 0, "caller must pad W to the int8 sublane tile"
    assert x_scales.shape == (T,) and w_scales.shape == (Co,)
    if not interpret and jax.default_backend() != "tpu":
        # numerics-faithful emulation for CPU runs/tests: conv over the
        # SAME quantized operands, dequantized in the epilogue
        y = jax.lax.conv_general_dilated(
            x_ext[None].astype(jnp.float32),
            w.reshape(3, 3, 3, C, Co).astype(jnp.float32),
            (1, 1, 1), [(0, 0), (0, 0), (0, 0)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
        y = y * x_scales[:, None, None, None] * w_scales[None, None, None, :]
        return y.astype(jnp.bfloat16)
    while Co % cob:
        cob //= 2

    def vmem_bytes(hb_, wb_):
        # win slots + wcat + slab temporaries (~3 windows) + int32 acc
        # + double-buffered weights and output block. Calibrated against
        # Mosaic's reported scoped allocations (~1.2x this estimate).
        wq_ = wb_ + _SUBLANE
        return ((2 * 3 + 3 + 3) * (hb_ + 2) * wq_ * C
                + hb_ * wq_ * cob * 4 + 2 * 9 * 3 * C * cob
                + 2 * hb_ * wb_ * cob * 2)

    def pick_blocks():
        # maximize modeled throughput over (hb, wb) pairs that fit VMEM:
        # useful-work fraction wb/(wb+32) (halo-extended columns are
        # computed and discarded) x a serialized MXU+VPU step-cost model
        # (the wcat build is VPU copies: ~9(hb+2)wq*C bytes per co-block
        # against 27*hb*wq*C*cob*2 MXU flops)
        best, best_score = (1, _SUBLANE), -1.0
        for h_try in (16, 8, 4, 2, 1):
            if H % h_try:
                continue
            for wb_try in range(((Wp + _SUBLANE - 1) // _SUBLANE)
                                * _SUBLANE, 0, -_SUBLANE):
                if vmem_bytes(h_try, wb_try) > 12_000_000:
                    continue
                wq_ = wb_try + _SUBLANE
                mxu_s = 27 * h_try * wq_ * C * cob * 2 / 394e12
                vpu_s = 9 * (h_try + 2) * wq_ * C / 1.33e12
                score = (min(wb_try, Wp) / wq_) * (h_try * wq_) \
                    / ((mxu_s + vpu_s) * 1e12)
                if score > best_score:
                    best, best_score = (h_try, wb_try), score
                break  # widest fitting wb for this hb is near-optimal
        return best

    hb, wb = pick_blocks()
    n_h = H // hb
    n_w = -(-Wp // wb)
    wq = wb + _SUBLANE

    # zero-pad so every column block's window read (offset j*wb, extent
    # wb+32) stays in bounds; trailing blocks compute discarded columns
    xq = jnp.pad(x_ext, ((0, 0), (0, 0),
                         (0, n_w * wb + _SUBLANE - Wp), (0, 0)))

    # (27, C, Co) -> (9, 3C, cob-blocked): the dw taps are adjacent on the
    # contraction axis, matching wcat's [x, x<<1, x<<2] lane concatenation
    w9 = w.reshape(3, 3, 3 * C, Co).reshape(9, 3 * C, Co)

    kernel = functools.partial(_conv_kernel, hb=hb, wb=wb, wq=wq, C=C,
                               cob=cob, n_h=n_h, n_w=n_w,
                               n_steps=T * n_h * n_w)
    grid = (T, n_h, n_w, Co // cob)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),         # x stays in HBM
                pl.BlockSpec((9, 3 * C, cob),
                             lambda t, h, j, co, xs: (0, 0, co),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cob), lambda t, h, j, co, xs: (0, co),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hb, wb, cob),
                                   lambda t, h, j, co, xs: (t, h, j, co)),
            scratch_shapes=[
                pltpu.VMEM((hb * wq, cob), jnp.int32),
                pltpu.VMEM((2, 3, hb + 2, wq, C), jnp.int8),
                pltpu.VMEM((hb + 2, wq, 3 * C), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T, H, n_w * wb, Co), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * H * W * C * Co * 27,
            bytes_accessed=int(x_ext.size * 3 + T * H * W * Co * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_scales, xq, w9, w_scales.reshape(1, Co))
    return out[:, :, :W]


def int8_conv_viable(ci: int, co: int, w: int) -> bool:
    """Whether the kernel can serve this conv shape. The 2D (hb, wb)
    block search scales the window down to any width, so the only hard
    requirements are MXU-lane-tileable channel dims."""
    return ci % 128 == 0 and co % 128 == 0 and w >= 2


def quantize_conv_weight(w: jnp.ndarray):
    """(kt, kh, kw, Ci, Co) float -> ((27, Ci, Co) int8, (Co,) f32 scales)
    per output channel."""
    kt, kh, kw, ci, co = w.shape
    w32 = jnp.asarray(w, jnp.float32).reshape(kt * kh * kw, ci, co)
    absmax = jnp.max(jnp.abs(w32), axis=(0, 1))
    s = absmax / 127.0
    inv = jnp.where(s > 0, 1.0 / s, 0.0)
    q = jnp.clip(jnp.round(w32 * inv[None, None, :]), -127, 127)
    return q.astype(jnp.int8), s


def norm_silu_quantize(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                       num_groups: int, head: jnp.ndarray = None,
                       eps: float = 1e-6):
    """Fused GroupNorm(per-frame stats) + SiLU + symmetric int8 quantize,
    emitted in the int8 conv kernel's extended/padded layout — the
    "int8 activations across convs" redesign (docs/performance.md round-2
    'Tried and rejected' follow-up; VERDICT r2 item 2).

    The v1 path cost ~5 full-tensor HBM reads + 2.5 writes per conv
    (norm stats, norm apply, bf16 write, absmax, quantize, pad copy); here:
      pass 1: mean / E[x^2] / max|x| per (frame, group) — ONE read.
      scale : analytic bound through the affine+SiLU, no absmax pass:
              max|silu(z*gamma+beta)| <= max_c(|gamma_c|*zbound_g+|beta_c|)
              with zbound_g = (max|x| + |mean|) * rsqrt(var+eps), clamped
              below by silu's negative lobe 0.2785. Slightly conservative
              (the true max rarely sits on the max-|gamma| channel), which
              costs <1 bit of the int8 range — accuracy is asserted against
              the bf16 decode in tests/test_int8_conv.py.
      pass 2: normalize+silu+quantize+pad — one read, one (half-size) int8
              write, fused by XLA into a single elementwise chain.

    x: (1, T, H, W, C) float; head: (1, 2, H, W, C) carried bf16 tail of
    the previous slice (ACTIVE) or None (INITIALIZING -> repeat frame 0).
    Returns (x_ext (T+2, H+2, Wp, C) int8, scale f32 scalar,
    tail (1, 2, H, W, C) bf16 state for the next slice)."""
    _, t, hh, ww, c = x.shape
    g = num_groups
    xr = x[0].astype(jnp.float32).reshape(t, hh * ww, g, c // g)
    mean = jnp.mean(xr, axis=(1, 3), keepdims=True)          # (t,1,g,1)
    meansq = jnp.mean(jnp.square(xr), axis=(1, 3), keepdims=True)
    maxabs = jnp.max(jnp.abs(xr), axis=(1, 3), keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)

    g32 = gamma.astype(jnp.float32).reshape(g, c // g)
    b32 = beta.astype(jnp.float32).reshape(g, c // g)
    zbound = (maxabs + jnp.abs(mean)) * inv                  # (t,1,g,1)
    chan_bound = (jnp.abs(g32)[None, None] * zbound
                  + jnp.abs(b32)[None, None])                # (t,1,g,c/g)
    bound = jnp.maximum(jnp.max(chan_bound), 0.2785)

    def norm_silu(frames32, mean_, inv_):
        y = (frames32 - mean_) * inv_ * g32[None, None] + b32[None, None]
        return jax.nn.silu(y)

    if head is not None:
        habs = jnp.max(jnp.abs(head.astype(jnp.float32)))
        scale = jnp.maximum(bound, habs) / 127.0
    else:
        scale = bound / 127.0
    inv_s = 1.0 / scale

    def quant(y32):
        return jnp.clip(jnp.round(y32 * inv_s), -127, 127).astype(jnp.int8)

    yq = quant(norm_silu(xr, mean, inv)).reshape(t, hh, ww, c)
    if head is not None:
        hq = quant(head[0].astype(jnp.float32))
    else:
        hq = jnp.repeat(yq[:1], 2, axis=0)
    wp = _round_up(ww + 2, _SUBLANE)
    x_ext = jnp.pad(jnp.concatenate([hq, yq], axis=0),
                    ((0, 0), (1, 1), (1, wp - ww - 1), (0, 0)))

    # bf16 state tail for the NEXT slice: recomputed on the last 2 frames
    # only (y itself is never materialized in bf16)
    nt = min(2, t)
    tail = norm_silu(xr[t - nt:], mean[t - nt:], inv[t - nt:])
    tail = tail.reshape(nt, hh, ww, c)
    if nt < 2:
        pre = (head[0, -(2 - nt):].astype(jnp.float32) if head is not None
               else jnp.repeat(tail[:1], 2 - nt, axis=0))
        tail = jnp.concatenate([pre, tail], axis=0)
    return x_ext, scale, tail[None].astype(x.dtype)


def int8_causal_conv3d(x: jnp.ndarray, w: jnp.ndarray, bias,
                       hb: int = 8, cob: int = 128,
                       interpret: bool = False,
                       head: jnp.ndarray = None) -> jnp.ndarray:
    """Drop-in int8 path for a full causal (3,3,3)/stride-1 conv on one
    batch element: x (1, T, H, W, Ci) bf16 (NOT yet extended), w
    (3, 3, 3, Ci, Co). Handles the causal head — `head` (1, 2, H, W, Ci)
    is the previous slice's carried tail (ACTIVE state); None repeats
    frame 0 (INITIALIZING) — plus spatial zero-pad (W padded to the int8
    sublane tile), bias, and a per-tensor activation scale covering the
    extended input."""
    assert x.shape[0] == 1
    T, H, W = x.shape[1], x.shape[2], x.shape[3]
    x32 = x[0].astype(jnp.float32)
    if head is not None:
        x32 = jnp.concatenate([head[0].astype(jnp.float32), x32], axis=0)
    absmax = jnp.max(jnp.abs(x32))
    inv = jnp.where(absmax > 0, 127.0 / absmax, 0.0)
    xq = jnp.clip(jnp.round(x32 * inv), -127, 127).astype(jnp.int8)
    if head is None:
        xq = jnp.concatenate([jnp.repeat(xq[:1], 2, axis=0), xq], axis=0)
    wp = _round_up(W + 2, _SUBLANE)
    x_ext = jnp.pad(xq, ((0, 0), (1, 1), (1, wp - W - 1), (0, 0)))
    gscale = jnp.where(absmax > 0, absmax / 127.0, 0.0)
    wq, ws = quantize_conv_weight(w)
    out = int8_conv3d(x_ext, wq, jnp.broadcast_to(gscale, (T,)), ws,
                      hb=hb, cob=cob, interpret=interpret)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out[None, :, :, :W]
