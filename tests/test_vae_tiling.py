"""Decoder head/tail factorization and tile-grid planner properties."""

import numpy as np

import jax
import jax.numpy as jnp

from seedvr2_tpu.core.configs import VAEConfig
from seedvr2_tpu.models.vae.model import (decoder_core, decoder_head,
                                          decoder_tail)
from seedvr2_tpu.models.vae.pipeline_vae import (_min_overlap, _plan_grid,
                                                 init_vae_params)

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
