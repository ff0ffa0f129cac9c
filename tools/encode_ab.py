"""A/B the im2col small-K conv lowering inside the FULL 4K encode.

tools/conv_in_study.py measured conv_in 13x faster ISOLATED (536 -> 40
ms at the study shape), but the first in-context reading after the
lowering landed (bench encode 4.881 s vs the pre-im2col 4.71 s probe)
suggests the win may not survive inside the whole encoder program —
XLA fuses the stock conv differently when it has consumers. This times
the bench-form tiled 4K encode (1536 cap, 64 px overlap) with the
lowering ON and OFF in ONE session (fresh VideoVAE per variant so the
per-instance jit wrappers re-trace), and also reports the per-tile
compile-only HBM demand both ways (the patch tensor is a real temp).

Usage: python tools/encode_ab.py
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

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae import model as vae_model
    from seedvr2_tpu.models.vae.pipeline_vae import (VideoVAE,
                                                     init_vae_params)
    from seedvr2_tpu.utils import memplan

    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, VAE_V3, dtype=jnp.bfloat16)
    video = jax.random.uniform(jax.random.fold_in(key, 1),
                               (1, 5, 2160, 3840, 3), jnp.bfloat16,
                               -1.0, 1.0)

    def force(x):
        return float(jnp.mean(x.astype(jnp.float32)))

    # Probe the EXACT tile the timed encode below will plan (cap 1536,
    # 64 px overlap) instead of inlining the planner's output — so a
    # planner/ladder change can't silently desynchronize the reported
    # per-tile HBM numbers from the executed grid (ADVICE r4 #1).
    import statistics

    from seedvr2_tpu.models.vae.pipeline_vae import _plan_grid

    sf = VAE_V3.spatial_downsample_factor
    cap_lat = 1536 // sf
    ov_lat = 64 // sf
    _, th_lat, _, tw_lat = _plan_grid(2160 // sf, 3840 // sf,
                                      cap_lat * cap_lat, ov_lat, ov_lat)

    out = {}
    for tag, max_k in (("im2col_on", 128), ("im2col_off", 0)):
        vae_model._IM2COL_MAX_K = max_k
        vae = VideoVAE(params, VAE_V3)  # fresh instance -> fresh jits
        try:
            mem_b = memplan.probe_tile_bytes(vae, "encode", 1, 5,
                                             th_lat, tw_lat)
        except Exception as exc:  # noqa: BLE001
            mem_b = f"probe failed: {exc!r}"[:120]

        def enc(i):
            return vae.encode(video + (i * 1e-4), tiled=True,
                              tile_size=(1536, 1536), tile_overlap=(64, 64),
                              tile_mode="uniform")

        t0 = time.perf_counter()
        force(enc(0))
        compile_s = time.perf_counter() - t0
        # >=3 timed reps, report median + spread (ADVICE r4 #2: the r4
        # opt-in revert rested on one 3.6% single-rep delta against a
        # documented multi-second session variance)
        times = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            force(enc(i))
            times.append(time.perf_counter() - t0)
        out[tag] = {"compile_plus_run_s": round(compile_s, 2),
                    "run_median_s": round(statistics.median(times), 3),
                    "run_min_s": round(min(times), 3),
                    "run_max_s": round(max(times), 3),
                    "probe_tile_lat": [th_lat, tw_lat],
                    "tile_mem_gib": (round(mem_b / 2**30, 2)
                                     if isinstance(mem_b, int) else mem_b)}
        print(json.dumps({tag: out[tag]}), flush=True)
    print(json.dumps({"encode_ab": out}), flush=True)
    return out


if __name__ == "__main__":
    main()
