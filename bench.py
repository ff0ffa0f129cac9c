"""Benchmark: SeedVR2-3B one-step DiT upscale throughput, 720p->4K shape.

Measures the hot loop of the pipeline (phase 2 DiT denoise; SURVEY.md hot
loop 3/4) on real hardware: full 3B NaDiT (32 layers, 2560 dim, 20 heads),
bf16, 5-frame 4n+1 batch at 4K output latent (2 latent frames, 270x480
latent -> 135x240 tokens/frame, 3D windowed attention via the static window
planner + Pallas flash attention).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against an ANALYTICAL A100 reference estimate for the
same model/shape (the reference publishes no absolute numbers — BASELINE.md):
312 bf16 TFLOP/s at 40% MFU on ~2 * P * tokens FLOPs => ~1.5 frames/s/GPU.
"""

import json
import time

import _bootstrap  # noqa: F401


A100_BASELINE_FPS = 1.5  # analytical estimate, see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from seedvr2_tpu.core.configs import DIT_3B, RunnerConfig
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.core.runner import VideoDiffusionRunner

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = DIT_3B
        T, H, W = 2, 270, 480  # latent of 5 frames at 4K (3840x2160 /8)
        frames = 5
        txt_len = 58
        iters = 4
    else:  # tiny CPU smoke config
        from seedvr2_tpu.core.configs import small_test_config

        cfg = small_test_config()
        T, H, W = 2, 16, 16
        frames = 5
        txt_len = 8
        iters = 2

    key = jax.random.PRNGKey(0)
    params = init_dit_params(key, cfg, dtype=jnp.bfloat16)

    runner = VideoDiffusionRunner(params, cfg, vae=None,
                                  config=RunnerConfig(dit=cfg))

    noise = jax.random.normal(jax.random.fold_in(key, 1),
                              (T, H, W, cfg.vid_out_channels), jnp.bfloat16)
    blur = jax.random.normal(jax.random.fold_in(key, 2), noise.shape,
                             jnp.bfloat16)
    cond = runner.get_condition(noise, blur)
    txt = jax.random.normal(jax.random.fold_in(key, 3),
                            (txt_len, cfg.txt_in_dim), jnp.bfloat16)

    def run_once():
        out = runner.inference(noises=[noise], conditions=[cond],
                               texts_pos=[txt], texts_neg=[txt],
                               cfg_scale=1.0, steps=1)
        jax.block_until_ready(out)
        return out

    run_once()  # compile
    start = time.perf_counter()
    for _ in range(iters):
        run_once()
    elapsed = time.perf_counter() - start
    fps = frames * iters / elapsed

    print(json.dumps({
        "metric": "3B one-step DiT upscale 720p->4K frames/sec/chip",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
