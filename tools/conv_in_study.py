"""conv_in formulation study (VERDICT r3 #7): the encoder's 3->128 conv.

At Ci=3 the stock 3D conv runs 2.6-2.9 TF/s (the MXU pads the tiny
contraction), costing 37-42 ms of each 1024^2 encode tile (7%); plain
im2col (K=81, unaligned lanes) got 32 ms. Candidates here restructure the
contraction to be lane/sublane aligned so the MXU runs at full K
utilization; they are exact (same arithmetic, parity asserted vs the
stock conv before timing):

  conv3d   : lax.conv_general_dilated baseline (what causal_conv3d emits)
  im2col81 : patches (M, 81) @ (81, 128) - the round-3 variant
  im2col216: channels pre-padded 3->8, patches (M, 216) @ (216, 128);
             2.7x the MACs but fully aligned - roofline ~8-12 ms
  im2col108: taps padded 3->4 lanes, (M, 108) @ (108, 128)
  stack2d  : 3 temporal shifts concatenated into 9 channels, then ONE 2D
             (3,3,9,128) conv per frame batch - same 81-contraction but
             through XLA's 2D lowering

Run on the TPU:   python tools/conv_in_study.py
CPU parity only:  python tools/conv_in_study.py --parity (tiny shapes)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def conv3d(x_ext, w, b):
    out = jax.lax.conv_general_dilated(
        x_ext, w, window_strides=(1, 1, 1),
        padding=[(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + b


def _spatial_pad(x_ext):
    return jnp.pad(x_ext, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))


def _patches(xp, T, H, W, c):
    """(B,T+2,H+2,W+2,c) -> (B,T,H,W,27,c) tap-major patch tensor."""
    taps = []
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                taps.append(xp[:, dt:dt + T, dh:dh + H, dw:dw + W, :])
    return jnp.stack(taps, axis=-2)


def im2col(x_ext, w, b, c_pad=0):
    """Patch matmul; c_pad pads the channel dim (0 = raw 81-contraction)."""
    B, Te, _, _, C = x_ext.shape
    T = Te - 2
    if c_pad:
        x_ext = jnp.pad(x_ext, ((0, 0),) * 4 + ((0, c_pad - C),))
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, c_pad - C), (0, 0)))
        C = c_pad
    xp = _spatial_pad(x_ext)
    p = _patches(xp, T, xp.shape[2] - 2, xp.shape[3] - 2, C)
    m = p.reshape(B, T, xp.shape[2] - 2, xp.shape[3] - 2, 27 * C)
    out = jnp.dot(m, w.reshape(27 * C, -1),
                  preferred_element_type=jnp.float32).astype(x_ext.dtype)
    return out + b


def stack2d(x_ext, w, b):
    """Temporal taps folded into channels, one 2D conv."""
    B, Te, H, W, C = x_ext.shape
    T = Te - 2
    x9 = jnp.concatenate([x_ext[:, dt:dt + T] for dt in range(3)], axis=-1)
    w9 = jnp.concatenate([w[dt] for dt in range(3)], axis=2)  # (3,3,3C,Co)
    out = jax.lax.conv_general_dilated(
        x9.reshape(B * T, H, W, 3 * C), w9, window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(B, T, H, W, -1) + b


VARIANTS = {
    "conv3d": conv3d,
    "im2col81": lambda x, w, b: im2col(x, w, b, 0),
    "im2col216": lambda x, w, b: im2col(x, w, b, 8),
    "im2col108": lambda x, w, b: im2col(x, w, b, 4),
    "stack2d": stack2d,
}


def run(T=5, H=1024, W=1024, co=128, dtype=jnp.bfloat16, iters=3,
        parity_only=False):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, T + 2, H, W, 3), dtype)  # pre-extended T
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 3, co),
                          dtype) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (co,), dtype) * 0.1

    ref = None
    flops = 2 * T * H * W * 27 * 3 * co
    summary = {}
    for name, fn in VARIANTS.items():
        jf = jax.jit(fn)
        out = jf(x, w, b)
        out.block_until_ready()
        res = {"variant": name, "shape": [T, H, W, co]}
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            res["max_abs_err_vs_conv3d"] = err
            assert err < (0.2 if dtype == jnp.bfloat16 else 1e-4), (name, err)
        if not parity_only:
            t0 = time.perf_counter()
            for i in range(iters):
                float(jnp.mean(jf(x + i, w, b).astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / iters
            res["ms"] = round(dt * 1e3, 2)
            res["tf_per_s"] = round(flops / dt / 1e12, 2)
            summary[name] = res["ms"]
        print(json.dumps(res), flush=True)
    return summary


if __name__ == "__main__":
    if "--parity" in sys.argv:
        jax.config.update("jax_platform_name", "cpu")
        jax.config.update("jax_platforms", "cpu")
        run(T=3, H=16, W=20, co=16, dtype=jnp.float32, parity_only=True)
    else:
        from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

        enable_persistent_cache()
        run()
