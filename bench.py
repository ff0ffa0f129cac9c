"""Benchmark: SeedVR2-3B END-TO-END upscale throughput, 720p->4K, one chip.

Measures the full compute chain of the pipeline on real hardware (VERDICT r1
item 3 — the north-star metric is end-to-end frames/s/chip, and the VAE at
4K dominates wall time, reference README.md:940):

  encode : VAE encode of the 4K-resized input (5 frames, uniform tile grid)
  dit    : one-step 3B NaDiT denoise at 4K latent (2x270x480, bf16,
           windowed Pallas flash attention)
  decode : tiled VAE decode to 4K (uniform tile grid)

Weights are random (zero-egress env); shapes/arithmetic are exactly the real
model's. Inputs live in HBM, are re-randomized every iteration (the axon dev
client memoizes repeated executions), and each iteration ends with a 4-byte
scalar fetch — the only reliable execution barrier through the dev tunnel.

Each phase runs in its OWN subprocess. This mirrors the product's per-phase
HBM residency policy (3B bf16 = 6.6 GB > 30% of HBM, so the pipeline drops
the DiT from HBM during the VAE phases — core/model_manager
._PHASE_OFFLOAD_FRACTION; on a real TPU VM the phase transition re-uploads
6.6 GB over PCIe in <1 s, amortized once per chunk) and sidesteps the axon
dev tunnel's deferred buffer reclamation, which otherwise poisons any
multi-phase single-process measurement.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline compares against an ANALYTICAL A100 end-to-end estimate (the
reference publishes no absolute numbers — BASELINE.md):
  A100 312 bf16 TFLOP/s at 40% MFU = 125 TF/s effective, on
  encode ~396 TF (4K, 5 frames) + DiT ~350 TF + decode ~1023 TF exact
  coverage x1.71 stride-sweep tile waste (reference tiling) = 1749 TF
  => (396 + 350 + 1749) / 125 = 20.0 s per 5 frames => 0.25 frames/s.
The DiT-only number and its A100 baseline (1.5 f/s, same method) are kept
as extra fields for continuity with BENCH_r01.
"""

import json
import os
import subprocess
import sys
import time

import _bootstrap  # noqa: F401

A100_E2E_BASELINE_FPS = 0.25   # analytical, see module docstring
A100_DIT_BASELINE_FPS = 1.5    # analytical (BENCH_r01 continuity)
FRAMES = 5


def _note(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _shapes(on_tpu: bool):
    if on_tpu:
        from seedvr2_tpu.core.configs import DIT_3B, VAE_V3

        return dict(dit_cfg=DIT_3B, vae_cfg=VAE_V3,
                    in_h=2160, in_w=3840, lt=2, lh=270, lw=480, txt_len=58,
                    iters=3, enc_tile=(1024, 1024), dec_tile=(1088, 1088))
    from seedvr2_tpu.core.configs import VAEConfig, small_test_config

    return dict(dit_cfg=small_test_config(),
                vae_cfg=VAEConfig(block_out_channels=(8, 8, 16, 16),
                                  layers_per_block=1, latent_channels=16,
                                  norm_num_groups=4),
                in_h=64, in_w=64, lt=2, lh=8, lw=8, txt_len=8,
                iters=1, enc_tile=(48, 48), dec_tile=(48, 48))


def _force(x):
    """Fetch a 4-byte scalar: the only reliable execution barrier through
    the axon dev client (block_until_ready can return before the remote
    execution completes; see docs/performance.md env caveats)."""
    import jax.numpy as jnp

    return float(jnp.mean(x.astype(jnp.float32)))


def _timed(fn, iters):
    fn(0)  # compile
    start = time.perf_counter()
    for i in range(iters):
        fn(i + 1)
    return (time.perf_counter() - start) / iters


def phase_encode():
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    p = _shapes(jax.default_backend() == "tpu")
    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(jax.random.fold_in(key, 9), p["vae_cfg"],
                                   dtype=jnp.bfloat16), p["vae_cfg"])
    runner = VideoDiffusionRunner(
        None, p["dit_cfg"], vae=vae,
        config=RunnerConfig(dit=p["dit_cfg"], vae=p["vae_cfg"]),
        encode_tiled=True, encode_tile_size=p["enc_tile"],
        encode_tile_overlap=(128, 128), tile_mode="uniform")

    def run(i):
        video = jax.random.uniform(
            jax.random.fold_in(key, 1000 + i),
            (FRAMES, p["in_h"], p["in_w"], 3), jnp.bfloat16, -1.0, 1.0)
        _force(runner.vae_encode([video])[0])

    return _timed(run, p["iters"])


def phase_dit():
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params

    p = _shapes(jax.default_backend() == "tpu")
    cfg = p["dit_cfg"]
    key = jax.random.PRNGKey(0)
    params = init_dit_params(key, cfg, dtype=jnp.bfloat16)
    quant = os.environ.get("BENCH_QUANT", "none")
    if quant == "w8a8":
        from seedvr2_tpu.ops.int8_matmul import quantize_dit_params_w8a8

        params = quantize_dit_params_w8a8(params)
    elif quant == "q8":
        from seedvr2_tpu.ops.quant_matmul import quantize_dit_params

        params = quantize_dit_params(params)
    runner = VideoDiffusionRunner(params, cfg, vae=None,
                                  config=RunnerConfig(dit=cfg))
    txt = jax.random.normal(jax.random.fold_in(key, 3),
                            (p["txt_len"], cfg.txt_in_dim), jnp.bfloat16)

    def run(i):
        noise = jax.random.normal(
            jax.random.fold_in(key, 2000 + i),
            (p["lt"], p["lh"], p["lw"], cfg.vid_out_channels), jnp.bfloat16)
        blur = jax.random.normal(jax.random.fold_in(key, 3000 + i),
                                 noise.shape, jnp.bfloat16)
        cond = runner.get_condition(noise, blur)
        _force(runner.inference(
            noises=[noise], conditions=[cond], texts_pos=[txt],
            texts_neg=[txt], cfg_scale=1.0, steps=1)[0])

    return _timed(run, p["iters"])


def phase_decode():
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    p = _shapes(jax.default_backend() == "tpu")
    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(jax.random.fold_in(key, 9), p["vae_cfg"],
                                   dtype=jnp.bfloat16), p["vae_cfg"])
    runner = VideoDiffusionRunner(
        None, p["dit_cfg"], vae=vae,
        config=RunnerConfig(dit=p["dit_cfg"], vae=p["vae_cfg"]),
        decode_tiled=True, decode_tile_size=p["dec_tile"],
        decode_tile_overlap=(128, 128), tile_mode="uniform")
    lat_c = p["vae_cfg"].latent_channels

    def run(i):
        lat = jax.random.normal(jax.random.fold_in(key, 4000 + i),
                                (p["lt"], p["lh"], p["lw"], lat_c),
                                jnp.bfloat16)
        _force(runner.vae_decode([lat])[0])

    return _timed(run, p["iters"])


PHASES = {"encode": phase_encode, "dit": phase_dit, "decode": phase_decode}


def main():
    if len(sys.argv) > 1 and sys.argv[1] in PHASES:
        from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

        enable_persistent_cache()
        t = PHASES[sys.argv[1]]()
        print(json.dumps({"phase": sys.argv[1], "seconds": t}))
        return

    def run_phase(phase, env_extra=None):
        _note(f"phase {phase}{' ' + str(env_extra) if env_extra else ''}: "
              "launching")
        env = dict(os.environ, **(env_extra or {}))
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), phase],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, env=env)
        if res.returncode != 0:
            _note(f"phase {phase} FAILED:\n{res.stderr[-2000:]}")
            raise SystemExit(1)
        line = [ln for ln in res.stdout.splitlines()
                if ln.startswith("{")][-1]
        t = json.loads(line)["seconds"]
        _note(f"phase {phase}: {t:.3f} s")
        return t

    times = {phase: run_phase(phase) for phase in ("encode", "dit",
                                                   "decode")}
    # the int8 serving lane (--quant w8a8), reported alongside the bf16
    # default
    t_w8a8 = run_phase("dit", {"BENCH_QUANT": "w8a8"})

    total = sum(times.values())
    e2e_fps = FRAMES / total
    dit_fps = FRAMES / times["dit"]
    w8a8_fps = FRAMES / t_w8a8
    e2e_w8a8_fps = FRAMES / (times["encode"] + t_w8a8 + times["decode"])
    print(json.dumps({
        "metric": "3B end-to-end upscale 720p->4K frames/sec/chip "
                  "(VAE encode + 1-step DiT + tiled VAE decode)",
        "value": round(e2e_fps, 4),
        "unit": "frames/sec",
        "vs_baseline": round(e2e_fps / A100_E2E_BASELINE_FPS, 3),
        "encode_s": round(times["encode"], 3),
        "dit_s": round(times["dit"], 3),
        "decode_s": round(times["decode"], 3),
        "dit_frames_per_s": round(dit_fps, 4),
        "dit_vs_baseline": round(dit_fps / A100_DIT_BASELINE_FPS, 3),
        "dit_w8a8_s": round(t_w8a8, 3),
        "dit_w8a8_frames_per_s": round(w8a8_fps, 4),
        "dit_w8a8_vs_baseline": round(w8a8_fps / A100_DIT_BASELINE_FPS, 3),
        "e2e_w8a8_frames_per_s": round(e2e_w8a8_fps, 4),
    }))


if __name__ == "__main__":
    main()
