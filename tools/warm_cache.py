"""Warm the persistent XLA compile cache for deployment images.

First-time compiles of the DiT/VAE graphs take minutes (tens of minutes
through a dev tunnel). This script compiles the standard serving shapes
into the on-disk cache (utils/jit_cache.py, ~/.cache/seedvr2_tpu/jit by
default — override with SEEDVR2_JIT_CACHE) so production processes start
hot. Run it once per (machine image, jax version, model config):

    python tools/warm_cache.py                 # 3B bf16 + VAE at 720p->4K
    python tools/warm_cache.py --quant w8a8    # add the int8 serving lane
    python tools/warm_cache.py --model 7b --quant q8
    python tools/warm_cache.py --resolution 1080  # target short side

Compilation is driven through the same runner/bench phase functions the
CLI uses, so cache keys match production exactly. Weights are random —
only the compiled executables matter.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _bootstrap  # noqa: F401,E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["3b", "7b"], default="3b")
    ap.add_argument("--quant", choices=["none", "w8a8", "q8"],
                    default="none")
    ap.add_argument("--resolution", type=int, default=2160,
                    help="output short side (default 4K)")
    ap.add_argument("--skip_vae", action="store_true")
    ap.add_argument("--skip_dit", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on CPU with tiny shapes (this image "
                         "preloads jax, so JAX_PLATFORMS env is ignored — "
                         "the flag sets the platform in-process)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platform_name", "cpu")
        jax.config.update("jax_platforms", "cpu")

    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    path = enable_persistent_cache()
    print(f"[warm] cache dir: {path}", flush=True)

    import bench

    import jax

    p = bench._shapes(jax.default_backend() == "tpu")
    # map the requested output short side onto the bench's 16:9 shapes
    scale = args.resolution / 2160.0
    if jax.default_backend() == "tpu" and scale != 1.0:
        p = dict(p, in_h=int(2160 * scale) // 16 * 16,
                 in_w=int(3840 * scale) // 16 * 16)
        p["lh"] = p["in_h"] // 8
        p["lw"] = p["in_w"] // 8
    p["iters"] = 0  # compile + one warm execution only (iters in _timed)

    phases = []
    if not args.skip_vae:
        phases += ["encode", "decode"]
    if not args.skip_dit:
        if args.model == "7b":
            phases += ["dit_7b_q8"]
        elif args.quant == "w8a8":
            phases += ["dit_w8a8"]
        else:
            phases += ["dit"]
    for ph in phases:
        print(f"[warm] compiling {ph} ...", flush=True)
        t = bench.PHASES[ph](dict(p, iters=1))
        print(f"[warm] {ph}: {t:.3f} s/iter (executable cached)", flush=True)
    print("[warm] done", flush=True)


if __name__ == "__main__":
    main()
