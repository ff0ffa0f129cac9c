"""Device mesh construction and sharding rules.

Replaces the reference's process-level multi-GPU fan-out and dormant NCCL SP
machinery (src/common/distributed/{basic,advanced,ops}.py, SURVEY.md 2.3)
with jax.sharding: one SPMD program over a named mesh; XLA inserts the
collectives (all-gather / psum / all-to-all) over ICI.

Axes:
 - dp:   data parallel — independent batches / video segments (replaces the
         reference's per-GPU frame-range fan-out, inference_cli.py:1048-1214).
 - fsdp: parameter sharding (ZeRO-ish; replaces the dormant
         _HYBRID_SHARD_ZERO2 config, advanced.py:156-195).
 - tp:   tensor parallel — attention heads / mlp hidden sharding (the TPU
         answer to the reference's Ulysses head-scatter, ops.py:190-318).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factorize(n: int, ways: int = 3) -> Sequence[int]:
    """Split n into `ways` near-equal power factors (largest first)."""
    factors = [1] * ways
    i = 0
    remaining = n
    primes = []
    d = 2
    while remaining > 1:
        while remaining % d == 0:
            primes.append(d)
            remaining //= d
        d += 1
    for p in sorted(primes, reverse=True):
        factors[i % ways] *= p
        i += 1
    return sorted(factors, reverse=True)


def make_mesh(n_devices: Optional[int] = None,
              axis_names=("dp", "fsdp", "tp"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the first `n_devices` local devices. With `shape=None`
    the device count is factorized near-equally over the axes; an explicit
    `shape` pins each axis extent (e.g. CLI --tensor_parallel -> (dp, tp))."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if shape is None:
        shape = factorize(n, len(axis_names))
    elif len(shape) != len(axis_names) or int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {tuple(shape)} does not lay out "
                         f"{n} devices over axes {tuple(axis_names)}")
    devs = np.asarray(devices[:n]).reshape(shape)
    return Mesh(devs, axis_names)


def param_sharding(mesh: Mesh, leaf) -> NamedSharding:
    """FSDP+TP layout: 2D+ weights shard in-dim over fsdp and out-dim over tp
    when divisible; small/1D params replicate."""
    fsdp = mesh.shape.get("fsdp", 1)
    tp = mesh.shape.get("tp", 1)
    shape = leaf.shape
    spec = [None] * len(shape)
    if len(shape) >= 2:
        if shape[0] % fsdp == 0 and fsdp > 1:
            spec[0] = "fsdp"
        if shape[-1] % tp == 0 and tp > 1:
            spec[-1] = "tp"
    return NamedSharding(mesh, P(*spec))


def shard_params(mesh: Mesh, params):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, param_sharding(mesh, leaf)), params)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch axis over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))
