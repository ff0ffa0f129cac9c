"""ops/gather.py: run-chunked DMA gather planning + fallback semantics.

The Pallas kernel itself only runs on TPU; on CPU `gather_rows` must fall
back to jnp.take, and `plan_chunks` (pure numpy, shared by both backends)
must reconstruct the exact permutation."""

import numpy as np
import jax.numpy as jnp

from seedvr2_tpu.core.configs import DIT_3B
from seedvr2_tpu.models.dit.nadit import build_dit_plan
from seedvr2_tpu.ops.gather import _RHO, gather_rows, plan_chunks


def _apply_chunks(idx, src, dst, rho=_RHO):
    out = np.full(len(idx), -1, np.int64)
    for s, t in zip(src, dst):
        out[t:t + rho] = np.arange(s, s + rho)
    return out


def test_plan_chunks_reconstructs_real_transitions():
    plan = build_dit_plan(DIT_3B, (2, 270, 480), 58)
    for key, idx in plan.transitions.items():
        chunks = plan_chunks(idx)
        assert chunks is not None, key  # production runs are >= _RHO rows
        src, dst = chunks
        got = _apply_chunks(idx, src, dst)
        np.testing.assert_array_equal(got, idx, err_msg=str(key))


def test_plan_chunks_short_run_returns_none():
    idx = np.concatenate([np.arange(5), np.arange(100, 120)])  # run of 5 < 8
    assert plan_chunks(idx) is None


def test_gather_rows_fallback_matches_take():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 40, 256), dtype=np.float32))
    idx = rng.permutation(40).astype(np.int32)
    got = np.asarray(gather_rows(x, idx))
    ref = np.asarray(jnp.take(x, jnp.asarray(idx), axis=1))
    np.testing.assert_array_equal(got, ref)
