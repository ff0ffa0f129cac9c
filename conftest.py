"""Pytest root conftest: register the seedvr2_tpu package and force a CPU mesh.

Tests run on a virtual 8-device CPU platform so that multi-chip sharding
(mesh/pjit paths) is exercised without TPU hardware, per the project test
strategy (SURVEY.md section 4). Note: this image preloads jax via an axon
sitecustomize before any user code, so env vars are too late — we must use
jax.config updates (backend is still uninitialized at conftest time).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_platforms", "cpu")

import _bootstrap  # noqa: F401,E402
