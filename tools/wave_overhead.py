"""Measure host-side dp-wave orchestration overhead on the 8-dev CPU mesh.

The "~linear to N chips" scaling claim (README, BASELINE configs[4]) rests
on the dp waves in core/runner.py `_batched_waves` adding negligible
host-side work around the device compute: grouping by shape, jnp.stack,
the dp-sharded device_put, and the per-item result scatter. This tool
pins that down WITHOUT hardware: it runs the real `runner.vae_decode`
wave path on a virtual 8-device CPU mesh and compares against the same
jitted decode invoked directly on a pre-stacked, pre-sharded batch (pure
compute). The difference is exactly the orchestration the runner adds.

Run:  python tools/wave_overhead.py        (prints one JSON line)
Test: tests/test_wave_overhead.py asserts the fraction stays bounded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = 8


def _force_cpu_mesh():
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={N_DEV}"
        ).strip()
    import jax

    jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_platforms", "cpu")


def measure(reps: int = 5, lt: int = 2, lh: int = 12, lw: int = 16):
    """Returns dict with total/compute/overhead seconds per wave.

    Shapes are sized so one CPU wave decode takes O(seconds) — large
    enough that timer noise is <1%; tests shrink them further and bound
    the ABSOLUTE orchestration seconds instead (the host-side work is
    shape-independent apart from the stack/device_put memcpy)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import _bootstrap  # noqa: F401
    from seedvr2_tpu.core.configs import RunnerConfig, VAEConfig, \
        small_test_config
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params
    from seedvr2_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    mesh = make_mesh(n, axis_names=("dp",))
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 16, 16),
                        layers_per_block=1, latent_channels=16,
                        norm_num_groups=4)
    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(key, vae_cfg, dtype=jnp.float32),
                   vae_cfg, dtype=jnp.float32)
    runner = VideoDiffusionRunner(
        None, small_test_config(), vae=vae,
        config=RunnerConfig(dit=small_test_config(), vae=vae_cfg))
    runner.attach_mesh(mesh)

    lats = [jax.random.normal(jax.random.fold_in(key, i),
                              (lt, lh, lw, vae_cfg.latent_channels),
                              jnp.float32) for i in range(n)]

    # --- full runner path (orchestration + compute), one wave of n items
    def full():
        out = runner.vae_decode(lats)
        out[-1].block_until_ready()

    full()  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(reps):
        full()
    t_total = (time.perf_counter() - t0) / reps

    # --- pure compute: same jitted tiled/untiled decode entry the wave
    # calls, on a batch already stacked and dp-sharded
    scale = runner.config.vae.scaling_factor
    zs = jnp.stack([(x.astype(jnp.float32) / scale).astype(vae.dtype)
                    for x in lats])
    zs = jax.device_put(zs, NamedSharding(mesh, P("dp")))

    def compute():
        vae.decode(zs, tiled=False).block_until_ready()

    compute()
    t0 = time.perf_counter()
    for _ in range(reps):
        compute()
    t_compute = (time.perf_counter() - t0) / reps

    return {
        "devices": n,
        "items": n,
        "reps": reps,
        "wave_total_s": round(t_total, 4),
        "wave_compute_s": round(t_compute, 4),
        "orchestration_s": round(t_total - t_compute, 4),
        "orchestration_frac": round(max(0.0, 1.0 - t_compute / t_total), 4),
    }


if __name__ == "__main__":
    _force_cpu_mesh()
    print(json.dumps(measure()))
