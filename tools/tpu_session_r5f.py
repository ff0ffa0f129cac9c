"""One-process round-5f TPU capture: serving tile OVERLAP frontier.

The decode/encode serving overlap is 64 px (the reference model API's
own default, attn_video_vae.py:1184-1200). The CPU seam gate holds well
below that (tiny-model tiled-vs-untiled PSNR: 36.6 dB @64px, 35.7 @48,
34.1 @32 — floor 30; full-width strip grids measure BETTER, 36-38.6 dB,
because they have no vertical seams), so the remaining overlap is a
pure redundancy tax:

  decode @1088 cap: ov64 -> (4,2) 74x244, redundancy 1.115 (serving)
                    ov48 -> (4,2) 72x243, 1.080   (-3.1% FLOPs)
                    ov32 -> (4,2) 71x242, 1.061   (-4.8% FLOPs, forced)
                    ov32 -> (8,1) 38x480, 1.126   (planner pick: the
                          fitted aspect model predicts the th-term
                          saves ~9% despite MORE redundancy — but
                          full-width strips are exactly where the r5/r5b
                          compile helper died at bigger areas, so the
                          mem/compile probe gates the timed run)
  encode @1536 cap: ov64 -> (2,2) 139x244, 1.047
                    ov32 -> (2,2) 137x242, 1.023  (-2.2% FLOPs)

Steps (guarded, resumable, one session):
  1. decode_mem_strips_8x1_ov32 — compile-only memory/compile-health
     probe of the (8,1) 38x480 tile program (tile_probe.probe_aspect_mem).
  2. decode_ov{64,48,32}* — timed 4K serving decodes, median of 3,
     fresh on-device random params per variant, sweep between.
  3. encode_ov{64,32} — timed 4K serving encodes.

Decision rule: a variant wins if its median beats the ov64 anchor by
more than the anchor's rep spread; defaults then move in bench.py +
--preset throughput (NOT the reference-parity CLI defaults), with the
CPU seam gate pinned at the new overlap in tests/test_vae_tiling.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _session_harness import (HBM_BUDGET_GIB, SessionHarness, force,  # noqa: E402
                              reps, sweep)

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session_r5f.jsonl"


def _fresh_vae():
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, VAE_V3, dtype=jnp.bfloat16)
    return VideoVAE(params, VAE_V3), key, jnp


def decode_variant(ov_px: int, grid=None):
    vae, key, jnp = _fresh_vae()
    import jax

    z = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 270, 480, 16),
                          jnp.bfloat16)

    def run(i):
        force(vae.decode(z + i, tiled=True, tile_size=(1088, 1088),
                         tile_overlap=(ov_px, ov_px), tile_mode="uniform",
                         tile_grid=grid))

    out = reps(run, 3)
    out["n_tiles"] = len(vae.last_decode_tiles)
    out["tiles"] = [tuple(map(int, t)) for t in vae.last_decode_tiles[:2]]
    sweep()
    return out


def encode_variant(ov_px: int):
    vae, key, jnp = _fresh_vae()
    import jax

    x = jax.random.uniform(jax.random.fold_in(key, 2),
                           (1, 5, 2160, 3840, 3), jnp.bfloat16, -1.0, 1.0)

    def run(i):
        force(vae.encode(x + (i * 1e-4), tiled=True, tile_size=(1536, 1536),
                         tile_overlap=(ov_px, ov_px), tile_mode="uniform"))

    out = reps(run, 3)
    out["n_tiles"] = len(vae.last_encode_tiles)
    sweep()
    return out


def main():
    h = SessionHarness(LOG)
    h.start()
    h.acquire()

    from tools import tile_probe

    mem = h.guard("decode_mem_strips_8x1_ov32",
                  lambda: tile_probe.probe_aspect_mem("decode", 8, 1,
                                                      ov_px=32))
    sweep()

    h.guard("decode_ov64_anchor", lambda: decode_variant(64))
    h.guard("decode_ov48", lambda: decode_variant(48))
    h.guard("decode_ov32_grid4x2", lambda: decode_variant(32, grid=(4, 2)))
    if mem and mem.get("ok") and mem.get("total_gib", 99) < HBM_BUDGET_GIB:
        # force the probed grid rather than trusting the aspect planner
        # to re-pick (8,1): the timed program must be the one the memory
        # probe gated on, even if the fitted cost model changes
        h.guard("decode_ov32_strips_8x1", lambda: decode_variant(32,
                                                                 grid=(8, 1)))
    else:
        h.log({"step": "decode_ov32_strips_8x1", "ok": False,
               "error": f"gated out by mem probe: {mem}"})

    h.guard("encode_ov64_anchor", lambda: encode_variant(64))
    h.guard("encode_ov32", lambda: encode_variant(32))

    h.done()


if __name__ == "__main__":
    main()
