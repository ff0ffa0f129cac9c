"""A/B the bench decode path vs the probe decode path (r4 anomaly).

The aspect probe measured the (4,2) 4K decode at 11.47 s; the bench's
runner-path decode of what should be the same grid measured 15.07 s.
This times, in ONE session: (a) direct vae.decode with the bench's
tile_size=(1088,1088) cap (aspect planner), (b) direct decode with the
probe's forced tile_grid=(4,2), (c) the full runner.vae_decode path —
and prints each plan's rects so a planner divergence is visible.

Usage: python tools/decode_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402


def main():
    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import VAE_V3, DIT_3B, RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(key, VAE_V3, dtype=jnp.bfloat16), VAE_V3)
    z = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 270, 480, 16),
                          jnp.bfloat16)

    def force(x):
        return float(jnp.mean(x.astype(jnp.float32)))

    def timed(tag, fn):
        t0 = time.perf_counter()
        force(fn(0))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(fn(1))
        run_s = time.perf_counter() - t0
        print(json.dumps({
            "tag": tag, "compile_plus_run_s": round(compile_s, 2),
            "run_s": round(run_s, 2),
            "tiles": [tuple(t) for t in
                      (vae.last_decode_tiles or [])][:3],
            "n_tiles": len(vae.last_decode_tiles or [])}), flush=True)

    kw = dict(tiled=True, tile_overlap=(64, 64), tile_mode="uniform")
    timed("bench_form_cap1088",
          lambda i: vae.decode(z + i, tile_size=(1088, 1088), **kw))
    timed("probe_form_grid4x2",
          lambda i: vae.decode(z + i, tile_size=(592, 1952),
                               tile_grid=(4, 2), **kw))

    runner = VideoDiffusionRunner(
        None, DIT_3B, vae=vae, config=RunnerConfig(dit=DIT_3B, vae=VAE_V3),
        decode_tiled=True, decode_tile_size=(1088, 1088),
        decode_tile_overlap=(64, 64), tile_mode="uniform")
    lat = jax.random.normal(jax.random.fold_in(key, 2), (2, 270, 480, 16),
                            jnp.bfloat16)

    def run_runner(i):
        return runner.vae_decode([lat + i])[0]

    timed("runner_path_cap1088", run_runner)


if __name__ == "__main__":
    main()
