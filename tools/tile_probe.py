"""Probe the largest VAE tile grids that fit post-DCE HBM (VERDICT r3 #2).

Round 3's dead-state DCE cut 9.6 GiB of dead outputs per decode tile,
making larger tiles plausible; this tool measures which uniform grids
actually compile + run on the real chip at the 4K serving shape, and what
they cost, so `_plan_grid`'s area cap (bench dec_tile/enc_tile and the
CLI defaults) can be set to the fewest-tiles grid that fits.

Grids are planned at the SERVING overlap (64 px = 8 latent — the
reference model API's own default, accuracy-gated in
tests/test_vae_tiling.py) with the SERVING cost model (decode plans by
the measured aspect model since the r4 capture; see
docs/performance.md "tile aspect" section for the sweep this tool
produced: decode winner (4,2) of 74x244 at 11.47 s, encode 1536-cap
(2,2) of 139x244 at 4.71 s; decode caps >= 1280 exceed 16 GB HBM).

Run on the TPU (one lane at a time keeps OOM blast radius small):
  python tools/tile_probe.py decode 1280 1536
  python tools/tile_probe.py encode 1536 2176
Prints one JSON line per probe; failures are caught and reported.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

FRAMES = 5
H4K, W4K = 2160, 3840
OV_PX = 64      # serving overlap (see module docstring)
OV_LAT = OV_PX // 8


def _force(x):
    import jax.numpy as jnp

    return float(jnp.mean(x.astype(jnp.float32)))


def probe(kind: str, tile_px: int):
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae.pipeline_vae import (VideoVAE, _plan_grid,
                                                     init_vae_params)

    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(key, VAE_V3, dtype=jnp.bfloat16), VAE_V3)
    lt = tile_px // 8
    h, w = H4K // 8, W4K // 8
    ys, th, xs, tw = _plan_grid(h, w, lt * lt, OV_LAT, OV_LAT,
                                cost="aspect" if kind == "decode"
                                else "area")
    grid = (len(ys), len(xs))
    red = grid[0] * grid[1] * th * tw / (h * w)
    out = {"kind": kind, "tile_px": tile_px, "grid": grid,
           "tile_latent": (th, tw), "redundancy": round(red, 3)}
    try:
        if kind == "decode":
            z = jax.random.normal(jax.random.fold_in(key, 1),
                                  (1, 2, h, w, VAE_V3.latent_channels),
                                  jnp.bfloat16)
            t0 = time.perf_counter()
            _force(vae.decode(z, tiled=True, tile_size=(tile_px, tile_px),
                              tile_overlap=(OV_PX, OV_PX), tile_mode="uniform"))
            out["compile_plus_run_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            _force(vae.decode(z + 1, tiled=True,
                              tile_size=(tile_px, tile_px),
                              tile_overlap=(OV_PX, OV_PX), tile_mode="uniform"))
            out["run_s"] = round(time.perf_counter() - t0, 2)
        else:
            x = jax.random.uniform(jax.random.fold_in(key, 2),
                                   (1, FRAMES, H4K, W4K, 3), jnp.bfloat16,
                                   -1.0, 1.0)
            t0 = time.perf_counter()
            _force(vae.encode(x, tiled=True, tile_size=(tile_px, tile_px),
                              tile_overlap=(OV_PX, OV_PX), tile_mode="uniform"))
            out["compile_plus_run_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            _force(vae.encode(x - 1, tiled=True,
                              tile_size=(tile_px, tile_px),
                              tile_overlap=(OV_PX, OV_PX), tile_mode="uniform"))
            out["run_s"] = round(time.perf_counter() - t0, 2)
        out["ok"] = True
    except Exception as exc:  # noqa: BLE001 — report OOMs as data
        out["ok"] = False
        out["error"] = repr(exc)[:300]
    print(json.dumps(out), flush=True)
    return out


def probe_aspect(kind: str, nr: int, nc: int, ov_px: int = OV_PX):
    """Run probe of a FORCED (nr x nc) uniform grid at the 4K serving
    shape: per-tile wall time varies ~30% with tile aspect at equal area
    (r4 capture: decode 139x126 = 1.90 s/tile vs 101x171 = 1.42 s/tile),
    so the grid planner's area-minimizing cost is not the whole story —
    this measures aspects directly."""
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae.pipeline_vae import (VideoVAE, _plan_grid,
                                                     init_vae_params)

    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(key, VAE_V3, dtype=jnp.bfloat16), VAE_V3)
    h, w = H4K // 8, W4K // 8
    ov = ov_px // 8
    ys, th, xs, tw = _plan_grid(h, w, 0, ov, ov, force_grid=(nr, nc))
    red = nr * nc * th * tw / (h * w)
    out = {"kind": f"{kind}_aspect", "grid": (nr, nc), "ov_px": ov_px,
           "tile_latent": (th, tw), "redundancy": round(red, 3)}
    kw = dict(tiled=True, tile_size=(8 * th, 8 * tw),
              tile_overlap=(ov_px, ov_px), tile_mode="uniform",
              tile_grid=(nr, nc))
    try:
        if kind == "decode":
            z = jax.random.normal(jax.random.fold_in(key, 1),
                                  (1, 2, h, w, VAE_V3.latent_channels),
                                  jnp.bfloat16)
            t0 = time.perf_counter()
            _force(vae.decode(z, **kw))
            out["compile_plus_run_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            _force(vae.decode(z + 1, **kw))
        else:
            x = jax.random.uniform(jax.random.fold_in(key, 2),
                                   (1, FRAMES, H4K, W4K, 3), jnp.bfloat16,
                                   -1.0, 1.0)
            t0 = time.perf_counter()
            _force(vae.encode(x, **kw))
            out["compile_plus_run_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            _force(vae.encode(x - 1, **kw))
        out["run_s"] = round(time.perf_counter() - t0, 2)
        out["s_per_tile"] = round(out["run_s"] / (nr * nc), 3)
        out["ok"] = True
    except Exception as exc:  # noqa: BLE001 — report OOMs as data
        out["ok"] = False
        out["error"] = repr(exc)[:300]
    print(json.dumps(out), flush=True)
    return out


def probe_aspect_mem(kind: str, nr: int, nc: int, ov_px: int = OV_PX):
    """Compile-only HBM demand of one forced-grid tile (see probe_mem)."""
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae.pipeline_vae import (_decode_slices,
                                                     _plan_grid,
                                                     init_vae_params)

    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, VAE_V3, dtype=jnp.bfloat16)
    h, w = H4K // 8, W4K // 8
    ov = ov_px // 8
    ys, th, xs, tw = _plan_grid(h, w, 0, ov, ov, force_grid=(nr, nc))
    out = {"kind": f"{kind}_aspect_mem", "grid": (nr, nc), "ov_px": ov_px,
           "tile_latent": (th, tw),
           "redundancy": round(nr * nc * th * tw / (h * w), 3)}
    try:
        if kind == "decode":
            shape = (1, 2, th, tw, VAE_V3.latent_channels)
            fn = jax.jit(lambda p, z: _decode_slices(p, VAE_V3, z))
        else:
            from seedvr2_tpu.models.vae.model import encoder_core

            shape = (1, FRAMES, th * 8, tw * 8, 3)
            fn = jax.jit(lambda p, x: encoder_core(p, VAE_V3, x, None)[0])
        z = jax.ShapeDtypeStruct(shape, jnp.bfloat16)
        mem = fn.lower(params, z).compile().memory_analysis()
        gib = 1024 ** 3
        out["ok"] = True
        out["total_gib"] = round(
            (mem.temp_size_in_bytes + mem.argument_size_in_bytes
             + mem.output_size_in_bytes) / gib, 2)
    except Exception as exc:  # noqa: BLE001
        out["ok"] = False
        out["error"] = repr(exc)[:300]
    print(json.dumps(out), flush=True)
    return out


def probe_mem(kind: str, tile_px: int):
    """Compile-only HBM demand of ONE tile's work at the 4K serving shape
    via XLA memory_analysis (the round-3 DCE tool) — no execution, so a
    too-big candidate can't OOM-crash the session."""
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae.pipeline_vae import (_decode_slices,
                                                     _plan_grid,
                                                     init_vae_params)

    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, VAE_V3, dtype=jnp.bfloat16)
    lt = tile_px // 8
    h, w = H4K // 8, W4K // 8
    ys, th, xs, tw = _plan_grid(h, w, lt * lt, OV_LAT, OV_LAT,
                                cost="aspect" if kind == "decode"
                                else "area")
    out = {"kind": f"{kind}_mem", "tile_px": tile_px,
           "grid": (len(ys), len(xs)), "tile_latent": (th, tw),
           "redundancy": round(len(ys) * len(xs) * th * tw / (h * w), 3)}
    try:
        if kind == "decode":
            shape = (1, 2, th, tw, VAE_V3.latent_channels)
            fn = jax.jit(lambda p, z: _decode_slices(p, VAE_V3, z))
        else:
            from seedvr2_tpu.models.vae.model import encoder_core

            shape = (1, FRAMES, th * 8, tw * 8, 3)
            fn = jax.jit(lambda p, x: encoder_core(p, VAE_V3, x, None)[0])
        z = jax.ShapeDtypeStruct(shape, jnp.bfloat16)
        mem = fn.lower(params, z).compile().memory_analysis()
        gib = 1024 ** 3
        out["ok"] = True
        out["temp_gib"] = round(mem.temp_size_in_bytes / gib, 2)
        out["argument_gib"] = round(mem.argument_size_in_bytes / gib, 2)
        out["output_gib"] = round(mem.output_size_in_bytes / gib, 2)
        out["total_gib"] = round(
            (mem.temp_size_in_bytes + mem.argument_size_in_bytes
             + mem.output_size_in_bytes) / gib, 2)
    except Exception as exc:  # noqa: BLE001 — report compile failures as data
        out["ok"] = False
        out["error"] = repr(exc)[:300]
    print(json.dumps(out), flush=True)
    return out


def main():
    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    kind = sys.argv[1]
    if kind.endswith("_aspect_mem"):  # tile_probe.py decode_aspect_mem NR NC [OV_PX]
        a = [int(v) for v in sys.argv[2:]]
        probe_aspect_mem(kind[:-11], a[0], a[1], *(a[2:3] or [OV_PX]))
        return
    if kind.endswith("_aspect"):  # tile_probe.py decode_aspect NR NC [OV_PX]
        a = [int(v) for v in sys.argv[2:]]
        probe_aspect(kind[:-7], a[0], a[1], *(a[2:3] or [OV_PX]))
        return
    if kind.endswith("_mem"):
        for px in [int(a) for a in sys.argv[2:]]:
            probe_mem(kind[:-4], px)
        return
    for px in [int(a) for a in sys.argv[2:]]:
        probe(kind, px)


if __name__ == "__main__":
    main()
