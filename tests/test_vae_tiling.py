"""Decoder head/tail factorization and tile-grid planner properties."""

import numpy as np

import jax
import jax.numpy as jnp

from seedvr2_tpu.core.configs import VAEConfig
from seedvr2_tpu.models.vae.model import (decoder_core, decoder_head,
                                          decoder_tail)
from seedvr2_tpu.models.vae.pipeline_vae import (VideoVAE, _min_overlap,
                                                 _plan_grid, init_vae_params)

CFG = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                latent_channels=4, norm_num_groups=4)


def test_decoder_head_tail_composes_to_core():
    """decoder_core == decoder_tail(decoder_head(...)) at every split
    level (the factorization must be a pure refactor of the block loop,
    including the temporal-upsample first_slice drop)."""
    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, CFG, dtype=jnp.float32)
    z = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 6, 8, 4),
                          jnp.float32)
    ref, ref_state = decoder_core(params, CFG, z, None)
    for split in range(len(CFG.block_out_channels) + 1):
        h, s_head = decoder_head(params, CFG, z, None, split)
        out, s_tail = decoder_tail(params, CFG, h, None, split,
                                   first_slice=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        assert set(s_head) | set(s_tail) == set(ref_state)


def test_plan_grid_covers_and_respects_cap():
    """Planner invariants across a shape sweep: tiles cover every latent
    pixel, tile area <= cap, achieved overlap >= requested minimum (when
    more than one tile per axis), and redundancy never exceeds the
    reference stride-sweep's worst case."""
    rng = np.random.default_rng(0)
    for _ in range(50):
        h = int(rng.integers(8, 300))
        w = int(rng.integers(8, 500))
        ov = int(rng.integers(0, 20))
        cap = int(rng.integers(64, h * w + 1))
        ys, th, xs, tw = _plan_grid(h, w, cap, ov, ov)
        assert ys[0] == 0 and xs[0] == 0
        assert ys[-1] + th >= h and xs[-1] + tw >= w
        assert th <= h and tw <= w
        if len(ys) > 1:
            assert _min_overlap(ys, th) >= ov
            assert th * tw <= cap
        if len(xs) > 1:
            assert _min_overlap(xs, tw) >= ov
            assert th * tw <= cap
        covered = np.zeros((h, w), bool)
        for y in ys:
            for x in xs:
                covered[y:y + th, x:x + tw] = True
        assert covered.all()


def test_tiled_decode_seam_psnr_at_serving_overlaps():
    """Accuracy gate for the serving tile overlaps.

    The reference's model-level API default is tile_overlap=(64, 64)
    (attn_video_vae.py:1184-1200); its CLI default is 128 px. The r5f
    TPU capture moved the serving defaults to decode 48 px / encode
    32 px (tpu_session_r5f.jsonl: decode 11.02 s @48 vs 13.63 @64;
    encode 4.640 @32 vs 4.705 @64), so this gate pins every overlap the
    serving bundle can use. Measured on this random-weight tiny VAE
    (latent 24x32, 96 px tiles), tiled-vs-untiled PSNR is 36.6 dB at
    64 px, 35.7 at 48, 34.1 at 32 (the absolute level is set by per-tile
    GroupNorm statistics on random weights; real checkpoints sit much
    higher). Floor at 30 dB: a broken fade/stitch (wrong mask,
    off-by-one crop) lands below 20 dB."""
    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, CFG, dtype=jnp.float32)
    vae = VideoVAE(params, CFG, dtype=jnp.float32)
    z = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 24, 32, 4),
                          jnp.float32)
    ref = np.asarray(vae.decode(z, tiled=False))
    rng_span = float(ref.max() - ref.min())
    for ov in (64, 48, 32):
        out = np.asarray(vae.decode(z, tiled=True, tile_size=(96, 96),
                                    tile_overlap=(ov, ov),
                                    tile_mode="uniform"))
        assert out.shape == ref.shape
        mse = float(np.mean((out - ref) ** 2))
        psnr = 10 * np.log10(rng_span ** 2 / mse)
        assert psnr >= 30.0, f"tiled(ov={ov}px) vs untiled: {psnr:.1f} dB"


def test_forced_tile_grid_matches_planned_and_untiled():
    """tile_grid=(nr, nc) forces exactly that uniform grid (the tile-aspect
    serving lever: equal-area tiles differ ~30% in measured wall time on
    TPU, tools/tile_probe.py r4), and the stitched result still matches
    untiled decode/encode at seam-PSNR level."""
    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, CFG, dtype=jnp.float32)
    vae = VideoVAE(params, CFG, dtype=jnp.float32)
    z = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 24, 32, 4),
                          jnp.float32)
    ref = np.asarray(vae.decode(z, tiled=False))
    for grid in [(2, 2), (1, 3), (3, 1)]:
        out = np.asarray(vae.decode(z, tiled=True, tile_size=(96, 96),
                                    tile_overlap=(64, 64),
                                    tile_mode="uniform", tile_grid=grid))
        n_tiles = len(vae.last_decode_tiles)
        assert n_tiles == grid[0] * grid[1], (grid, n_tiles)
        rng_span = float(ref.max() - ref.min())
        psnr = 10 * np.log10(rng_span ** 2
                             / float(np.mean((out - ref) ** 2)))
        assert psnr >= 30.0, (grid, psnr)

    x = jax.random.uniform(jax.random.fold_in(key, 2), (1, 5, 96, 128, 3),
                           jnp.float32, -1.0, 1.0)
    ref_lat = np.asarray(vae.encode(x, tiled=False))
    out_lat = np.asarray(vae.encode(x, tiled=True, tile_size=(64, 64),
                                    tile_overlap=(32, 32),
                                    tile_mode="uniform", tile_grid=(2, 3)))
    assert len(vae.last_encode_tiles) == 6
    span = float(ref_lat.max() - ref_lat.min())
    psnr = 10 * np.log10(span ** 2
                         / float(np.mean((out_lat - ref_lat) ** 2)))
    assert psnr >= 25.0, psnr


def test_causal_conv_im2col_matches_conv3d():
    """The small-K im2col branch of causal_conv3d (conv_in's 13x isolated
    TPU win, tools/conv_in_study.py) is the same arithmetic as the stock
    conv lowering — exact on fp32, including the carried cross-slice
    state path and 1x1x1 kernels."""
    from seedvr2_tpu.models.vae import model as vae_model

    key = jax.random.PRNGKey(3)
    cases = [
        ((3, 3, 3, 3, 16), (1, 5, 12, 16, 3), 1),    # conv_in shape, K=81
        ((3, 3, 3, 4, 8), (1, 5, 8, 8, 4), 1),       # K=108
        ((1, 1, 1, 16, 8), (1, 3, 8, 8, 16), 0),     # quant-conv shape
    ]
    for (wk, xs, t_pad) in cases:
        params = {"c": {
            "w": jax.random.normal(jax.random.fold_in(key, 1), wk,
                                   jnp.float32) * 0.1,
            "b": jax.random.normal(jax.random.fold_in(key, 2), (wk[-1],),
                                   jnp.float32) * 0.1,
        }}
        x = jax.random.normal(jax.random.fold_in(key, 3), xs, jnp.float32)
        sp = ((1, 1), (1, 1)) if wk[0] == 3 else ((0, 0), (0, 0))

        def run(max_k):
            old = vae_model._IM2COL_MAX_K
            vae_model._IM2COL_MAX_K = max_k
            try:
                st = {}
                a = vae_model.causal_conv3d(params, "c", x, None,
                                            t_pad=t_pad, s_pad=sp,
                                            new_state=st)
                b = vae_model.causal_conv3d(params, "c", x, st, t_pad=t_pad,
                                            s_pad=sp)
                return a, b
            finally:
                vae_model._IM2COL_MAX_K = old
        (a_im, b_im), (a_cv, b_cv) = run(128), run(0)
        np.testing.assert_allclose(np.asarray(a_im), np.asarray(a_cv),
                                   rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(np.asarray(b_im), np.asarray(b_cv),
                                   rtol=2e-6, atol=2e-6)


def test_aspect_cost_plans_measured_fastest_4k_grid():
    """cost="aspect" reproduces the r4 TPU sweep's verdict at the 4K
    serving shape: (4,2) of 74x244 latent tiles under the 1088-cap at the
    64 px serving overlap (measured 11.47 s vs 15.22 s for the area-cost
    pick (2,4) of 139x126 — tpu_session_r4.jsonl). The area cost is
    unchanged (encode keeps it)."""
    ys, th, xs, tw = _plan_grid(270, 480, 136 * 136, 8, 8, cost="aspect")
    assert (len(ys), len(xs), th, tw) == (4, 2, 74, 244)
    ys, th, xs, tw = _plan_grid(270, 480, 136 * 136, 8, 8)
    assert (len(ys), len(xs), th, tw) == (2, 4, 139, 126)
    # r5f serving grids (tpu_session_r5f.jsonl): decode 48 px overlap ->
    # (4,2) of 72x243 (11.02 s vs 13.63 at 64 px); encode 32 px -> (2,2)
    # of 137x242 (4.640 s vs 4.705)
    ys, th, xs, tw = _plan_grid(270, 480, 136 * 136, 6, 6, cost="aspect")
    assert (len(ys), len(xs), th, tw) == (4, 2, 72, 243)
    ys, th, xs, tw = _plan_grid(270, 480, 192 * 192, 4, 4)
    assert (len(ys), len(xs), th, tw) == (2, 2, 137, 242)
    # aspect planning still honors the cap + coverage invariants
    rng = np.random.default_rng(1)
    for _ in range(25):
        h = int(rng.integers(8, 300))
        w = int(rng.integers(8, 500))
        ov = int(rng.integers(0, 16))
        cap = int(rng.integers(64, h * w + 1))
        ys, th, xs, tw = _plan_grid(h, w, cap, ov, ov, cost="aspect")
        assert ys[0] == 0 and xs[0] == 0
        assert ys[-1] + th >= h and xs[-1] + tw >= w
        if len(ys) > 1 or len(xs) > 1:
            assert th * tw <= cap
        covered = np.zeros((h, w), bool)
        for y in ys:
            for x in xs:
                covered[y:y + th, x:x + tw] = True
        assert covered.all()
