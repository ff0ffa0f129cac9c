"""Measure int8-v2 VAE decode vs bf16 on the chip (VERDICT r2 item 2).

Times one 4K decode tile (the bench's 1088 px uniform tile) and the full
tiled 4K decode, bf16 vs --vae_quant int8, and reports PSNR between the
two decodes (random weights — the relative-accuracy number; real-weights
PSNR needs a checkpoint drop, docs/parity.md).

Run on the TPU:  python tools/vae_tile_bench.py [--full] [--iters N]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _bootstrap  # noqa: F401,E402


def _force(x):
    import jax.numpy as jnp

    return float(jnp.mean(x.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--full", action="store_true",
                    help="also run the full 4K tiled decode both ways")
    ap.add_argument("--tile", type=int, default=136,
                    help="latent tile side (136 -> 1088 px)")
    args = ap.parse_args()

    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    key = jax.random.PRNGKey(0)
    params = init_vae_params(jax.random.fold_in(key, 9), VAE_V3,
                             dtype=jnp.bfloat16)
    lt = args.tile
    z = jax.random.normal(jax.random.fold_in(key, 1),
                          (1, 2, lt, lt, VAE_V3.latent_channels),
                          jnp.bfloat16)

    results = {}
    outs = {}
    for mode in ("bf16", "int8"):
        cfg = (VAE_V3 if mode == "bf16"
               else dataclasses.replace(VAE_V3, conv_quant="int8"))
        vae = VideoVAE(params, cfg)
        try:
            out = vae._dec_first_only(vae.params, z)   # compile + warm
        except Exception as exc:  # OOM etc. — report and keep going
            print(f"[tile] {mode}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)
            results[f"tile_{mode}_s"] = None
            continue
        _force(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            zi = jax.random.normal(jax.random.fold_in(key, 100 + i),
                                   z.shape, jnp.bfloat16)
            _force(vae._dec_first_only(vae.params, zi))
        dt = (time.perf_counter() - t0) / args.iters
        results[f"tile_{mode}_s"] = round(dt, 4)
        outs[mode] = np.asarray(vae._dec_first_only(vae.params, z), np.float32)
        print(f"[tile] {mode}: {dt:.3f} s/tile", flush=True)

    if "bf16" not in outs or "int8" not in outs:
        print(json.dumps(results), flush=True)
        return
    a, b = outs["bf16"], outs["int8"]
    mse = float(np.mean((a - b) ** 2))
    rng = float(a.max() - a.min())
    psnr = 10 * np.log10(rng * rng / mse) if mse > 0 else float("inf")
    results["tile_psnr_int8_vs_bf16_db"] = round(psnr, 2)
    print(f"[tile] PSNR int8 vs bf16: {psnr:.2f} dB (range {rng:.2f})",
          flush=True)

    if args.full:
        from seedvr2_tpu.core.configs import DIT_3B, RunnerConfig
        from seedvr2_tpu.core.runner import VideoDiffusionRunner

        for mode in ("bf16", "int8"):
            cfg = (VAE_V3 if mode == "bf16"
                   else dataclasses.replace(VAE_V3, conv_quant="int8"))
            vae = VideoVAE(params, cfg)
            runner = VideoDiffusionRunner(
                None, DIT_3B, vae=vae,
                config=RunnerConfig(dit=DIT_3B, vae=cfg),
                decode_tiled=True, decode_tile_size=(1088, 1088),
                decode_tile_overlap=(128, 128), tile_mode="uniform")

            def run(i):
                lat = jax.random.normal(jax.random.fold_in(key, 4000 + i),
                                        (2, 270, 480, 16), jnp.bfloat16)
                _force(runner.vae_decode([lat])[0])

            run(0)
            t0 = time.perf_counter()
            run(1)
            dt = time.perf_counter() - t0
            results[f"full_4k_{mode}_s"] = round(dt, 3)
            print(f"[full 4K decode] {mode}: {dt:.2f} s", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
