"""JAX backend acquisition hardened for the axon TPU tunnel.

The tunnel serializes client sessions and takes 0.5-10 min to reap a dead
one, so transient `Unavailable` errors at backend init are an EXPECTED
mode, not an act of God (this cost two driver rounds of bench history).
One retry loop, shared by bench.py and the capture tools so hard-won
fixes land in exactly one place. Retries cover *errors*; a *hang* inside
the init RPC needs a caller-side watchdog (bench._watchdog,
tools/tpu_session_r4._watchdog) — no Python-level timeout can interrupt
a wedged C++ RPC.
"""

import time


def force_platform(device: str) -> None:
    """Pin jax to `device` ("cpu" or "tpu") before first device use.

    This image preloads jax via sitecustomize, so JAX_PLATFORMS set in the
    process environment is read before user code runs and later changes are
    ignored; the config-update path still works until the first device is
    touched. Used by the CLI's --device flag so debug/CI runs don't try to
    acquire the TPU tunnel at all.
    """
    import jax

    jax.config.update("jax_platform_name", device)
    jax.config.update("jax_platforms", device)


def acquire_backend(give_up=None, note=print,
                    initial_delay: float = 20.0,
                    max_delay: float = 120.0,
                    growth: float = 1.6):
    """Init the default jax backend, retrying transient failures.

    Runs a tiny reduction as the probe so success means "computed on the
    device", not just "client object constructed". Returns
    (backend_name, device_count).

    give_up(next_delay_s) -> True re-raises the current failure instead of
    sleeping again (bench bounds this by its wall budget; capture tools
    pass None and rely on their watchdog).
    """
    delay = initial_delay
    attempt = 0
    while True:
        attempt += 1
        try:
            import jax
            import jax.numpy as jnp

            backend = jax.default_backend()
            float(jnp.mean(jnp.ones((2, 2), jnp.float32)))
            if attempt > 1:
                note(f"backend '{backend}' up after {attempt} attempts")
            return backend, len(jax.devices())
        except Exception as exc:  # noqa: BLE001 — transient tunnel fails
            if give_up is not None and give_up(delay):
                raise
            note(f"backend init failed (attempt {attempt}): {exc!r}; "
                 f"retrying in {delay:.0f}s")
            try:
                from jax._src import api as _japi

                _japi.clear_backends()
            except Exception:  # noqa: BLE001 — best-effort reset
                pass
            time.sleep(delay)
            delay = min(delay * growth, max_delay)
