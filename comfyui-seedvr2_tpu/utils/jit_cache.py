"""Persistent XLA compilation cache.

The TPU analogue of the reference's torch.compile cache controls
(SeedVR2TorchCompileSettings / model_configuration.py:1348-1450): compiled
executables are cached on disk keyed by HLO, so the multi-minute first-run
compilation of the DiT/VAE graphs is paid once per (shape, config) ever,
not once per process."""

import os


def enable_persistent_cache(path: str = None):
    import jax

    path = path or os.environ.get(
        "SEEDVR2_JIT_CACHE",
        os.path.expanduser("~/.cache/seedvr2_tpu/jit"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
