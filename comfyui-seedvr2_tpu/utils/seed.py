"""Deterministic seeding discipline.

The reference reseeds three global RNGs per batch (src/common/seed.py:23-30,
generation_phases.py:322-327,657-660). JAX has no global RNG: this module
documents and centralizes the key-derivation scheme so every stochastic site
is reproducible and rank-aware.

 - diffusion noise:   key(seed)                (re-derived per batch, so every
                                                batch sees identical noise —
                                                matching the reference reset)
 - VAE sampling:      key(seed + 1_000_000)    (collision-avoidance offset)
 - input noise:       fold_in(vae_key, batch_index)
 - multi-host:        fold_in(key, process_index) for decorrelated DP ranks
"""

import jax

VAE_SEED_OFFSET = 1_000_000


def noise_key(seed: int):
    return jax.random.PRNGKey(seed)


def vae_key(seed: int):
    return jax.random.PRNGKey(seed + VAE_SEED_OFFSET)


def rank_key(key, process_index=None):
    if process_index is None:
        process_index = jax.process_index()
    return jax.random.fold_in(key, process_index)
