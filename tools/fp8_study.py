"""fp8 compute study on v5e (VERDICT r2 item 9).

The reference advertises a native-fp8 pipeline ("2x speedup, 50% VRAM",
src/core/generation_phases.py:16) on hardware with fp8 tensor cores. This
repo treats fp8 checkpoints as a STORAGE format (upcast at load,
core/loader.py) and serves int8 via the w8a8 kernel instead. This script
measures what fp8-e4m3 math actually does on this chip so the claim
"fp8 is storage-only on v5e" is measured rather than assumed:

  1. XLA matmul with fp8_e4m3fn inputs (preferred_element_type=f32)
  2. the same shape in bf16
  3. the same shape via the int8 MXU kernel (ops/int8_matmul)
  4. fp8 STORAGE + bf16 compute (upcast fused into the matmul) — the
     HBM-bandwidth win fp8 storage can still deliver for weight-streaming

Run:  python tools/fp8_study.py            (on the TPU)
Appends nothing; prints a JSON-ish table for docs/performance.md.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import _bootstrap  # noqa: F401,E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _force(x):
    return float(jnp.mean(x.astype(jnp.float32)))


def _bench(fn, *args, iters=10):
    _force(fn(*args))  # compile + warm, FORCED: the first fetch through
    # the dev tunnel can stall minutes on session acquisition — keep that
    # out of the timed region
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    M, K, N = 64800, 2560, 2560  # the 3B DiT's 4K token count (qkv/proj
    # shape class) — the shape the int8 kernel's block chooser is tuned for
    flops = 2 * M * K * N
    key = jax.random.PRNGKey(0)
    a_bf = jax.random.normal(key, (M, K), jnp.bfloat16)
    b_bf = jax.random.normal(jax.random.fold_in(key, 1), (K, N), jnp.bfloat16)

    results = {}

    @jax.jit
    def mm_bf16(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    t = _bench(mm_bf16, a_bf, b_bf)
    results["bf16"] = dict(s=t, tflops=flops / t / 1e12)

    for dt_name in ("float8_e4m3fn", "float8_e5m2"):
        fp8 = getattr(jnp, dt_name, None)
        if fp8 is None:
            results[dt_name] = "dtype unavailable in this jax"
            continue
        a8 = a_bf.astype(fp8)
        b8 = b_bf.astype(fp8)

        @jax.jit
        def mm_fp8(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        try:
            t = _bench(mm_fp8, a8, b8)
            results[dt_name] = dict(s=t, tflops=flops / t / 1e12)
        except Exception as exc:  # noqa: BLE001
            results[dt_name] = f"FAILED: {type(exc).__name__}: {exc}"

        # fp8 storage, bf16 compute: upcast inside the jit so XLA fuses the
        # widen into the matmul read (weight-streaming bandwidth saver)
        @jax.jit
        def mm_fp8_storage(a, b8_):
            return jnp.dot(a, b8_.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        try:
            t = _bench(mm_fp8_storage, a_bf, b8)
            results[dt_name + "_storage_bf16_compute"] = dict(
                s=t, tflops=flops / t / 1e12)
        except Exception as exc:  # noqa: BLE001
            results[dt_name + "_storage_bf16_compute"] = f"FAILED: {exc}"

    try:
        from seedvr2_tpu.ops.int8_matmul import (quantize_weight_w8a8,
                                                 w8a8_linear)

        wq, ws = quantize_weight_w8a8(b_bf)

        @jax.jit
        def mm_int8(a):
            return w8a8_linear(a, wq, ws)

        t = _bench(mm_int8, a_bf)
        results["int8_w8a8_kernel"] = dict(s=t, tops=flops / t / 1e12)
    except Exception as exc:  # noqa: BLE001
        results["int8_w8a8_kernel"] = f"FAILED: {type(exc).__name__}: {exc}"

    print(f"\nfp8 study — matmul ({M}x{K})@({K}x{N}), v5e")
    for name, r in results.items():
        if isinstance(r, dict):
            rate = r.get("tflops", r.get("tops"))
            print(f"  {name:34s} {r['s'] * 1e3:8.2f} ms   {rate:7.1f} T/s")
        else:
            print(f"  {name:34s} {r}")
    return {k: (round(v["s"] * 1e3, 2) if isinstance(v, dict) else v)
            for k, v in results.items()}


if __name__ == "__main__":
    main()
