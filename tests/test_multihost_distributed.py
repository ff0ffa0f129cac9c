"""REAL multi-process jax.distributed integration for the multi-host path.

test_multihost.py covers the segment/join math in-process; this spawns
TWO actual Python processes that rendezvous through
``multihost.distributed_init`` (the wrapper the CLI uses — reference
counterpart: torch.distributed init, src/common/distributed/basic.py:
62-76), form one GLOBAL jax runtime (2 processes x 2 virtual CPU devices
= 4 global devices), run a cross-process collective, and execute the
documented fleet workflow: each host upscales its frame range and saves
a segment, the join pass Hann-blends the seams. Until a real pod
exists, this is the strongest executable evidence the multi-host wiring
works end to end.
"""

import os
import socket
import subprocess
import sys

import numpy as np

from seedvr2_tpu.parallel import multihost

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["SEEDVR2_REPO"])
import _bootstrap  # noqa: F401

import numpy as np

from seedvr2_tpu.parallel import multihost

idx = int(os.environ["WORKER_INDEX"])
coord = os.environ["COORD_ADDR"]
out = os.environ["SEG_OUT"]

import jax

# the image's sitecustomize registers the TPU plugin regardless of env
# vars; first device use must not touch it (the tunnel may be absent) —
# same in-process forcing conftest.py uses
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_platforms", "cpu")

assert multihost.distributed_init(coord, 2, idx), "distributed init failed"

assert jax.process_count() == 2, jax.process_count()
assert multihost.default_host_index() == idx
assert len(jax.local_devices()) == 2
assert len(jax.devices()) == 4, "global device view missing"

# a real cross-process collective over the distributed runtime
from jax.experimental import multihost_utils

mine = np.asarray([float(idx + 1)], np.float32)
everyone = np.asarray(multihost_utils.process_allgather(mine))
assert everyone.reshape(-1).tolist() == [1.0, 2.0], everyone

# the documented fleet workflow: process my frame range (fake 'upscale'
# = x2 nearest + +1 so seams are non-trivial), save my segment
total, overlap = 10, 2
ranges = multihost.frame_ranges(total, 2, overlap)
s, e = ranges[idx]
frames = (np.arange(total, dtype=np.float32)[:, None, None, None]
          * np.ones((4, 6, 3), np.float32))
seg = frames[s:e].repeat(2, axis=1).repeat(2, axis=2) + 1.0
multihost.save_segment(out, idx, seg)
print(f"worker {idx} ok", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_fanout(tmp_path):
    out = str(tmp_path / "video.mp4")
    coord = f"127.0.0.1:{_free_port()}"
    env_base = {
        **os.environ,
        "SEEDVR2_REPO": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        "COORD_ADDR": coord,
        "SEG_OUT": out,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = []
    for i in range(2):
        env = dict(env_base, WORKER_INDEX=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = []
    for i, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
        assert p.returncode == 0, f"worker {i} failed:\n{stdout[-3000:]}"
        assert f"worker {i} ok" in stdout

    # join pass: blended seams must reproduce the single-host result
    total, overlap = 10, 2
    frames = (np.arange(total, dtype=np.float32)[:, None, None, None]
              * np.ones((4, 6, 3), np.float32))
    expected = frames.repeat(2, axis=1).repeat(2, axis=2) + 1.0
    video = multihost.join_segments(out, 2, overlap)
    assert video.shape == expected.shape
    # segments store fp16 -> visually-lossless tolerance
    np.testing.assert_allclose(video, expected, atol=2e-2)
