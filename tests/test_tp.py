"""Inference tensor parallelism (parallel/tp.py): tp-sharded DiT forward
must equal the single-device forward.

Runs on the virtual 8-device CPU mesh (conftest). Covers both families:
3B (swiglu, mm vid/txt branches, shared tail blocks, vid_only last layer)
and 7B (plain mlp, separate branches), plus dp x tp composition and the
qkv column permutation round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from seedvr2_tpu.core.configs import RunnerConfig, small_test_config
from seedvr2_tpu.core.runner import VideoDiffusionRunner
from seedvr2_tpu.models.dit.nadit import init_dit_params
from seedvr2_tpu.parallel.tp import permute_qkv_cols, tp_compatible


def _mesh(dp, tp):
    n = dp * tp
    devs = np.asarray(jax.devices()[:n]).reshape(dp, 1, tp)
    return Mesh(devs, ("dp", "fsdp", "tp"))


def _runner(cfg, params, mesh=None):
    r = VideoDiffusionRunner(params, cfg, vae=None,
                             config=RunnerConfig(dit=cfg),
                             compute_dtype=jnp.float32)
    if mesh is not None:
        r.attach_mesh(mesh)
    return r


def _inputs(cfg, b=1, seed=0):
    key = jax.random.PRNGKey(seed)
    shape = (3, 8, 10, cfg.vid_out_channels)
    noises = [jax.random.normal(jax.random.fold_in(key, i), shape,
                                jnp.float32) for i in range(b)]
    blurs = [jax.random.normal(jax.random.fold_in(key, 100 + i), shape,
                               jnp.float32) for i in range(b)]
    txt = jax.random.normal(jax.random.fold_in(key, 7), (7, cfg.txt_in_dim),
                            jnp.float32)
    return noises, blurs, txt


def test_permute_qkv_cols_roundtrip():
    heads, dh, tp = 4, 6, 2
    w = np.random.default_rng(0).standard_normal((10, 3 * heads * dh))
    p = permute_qkv_cols(w, heads, dh, tp)
    # chip d's contiguous slice must equal the packed (3, Hloc, Dh) block
    # of its own heads
    hloc = heads // tp
    ref = w.reshape(10, 3, tp, hloc, dh)
    for d in range(tp):
        local = p[:, d * 3 * hloc * dh:(d + 1) * 3 * hloc * dh]
        expect = ref[:, :, d].reshape(10, 3 * hloc * dh)
        np.testing.assert_array_equal(local, expect)


@pytest.mark.parametrize("family", ["dit_3b", "dit_7b"])
def test_tp_matches_single_device(family):
    cfg = small_test_config(family=family)
    params = init_dit_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    assert tp_compatible(params, cfg, 2)
    noises, blurs, txt = _inputs(cfg)

    base = _runner(cfg, params)
    conds = [base.get_condition(n, b) for n, b in zip(noises, blurs)]
    out_ref = np.asarray(base.inference(
        noises=noises, conditions=conds, texts_pos=[txt], texts_neg=[txt],
        cfg_scale=1.0, steps=1)[0])

    tp_run = _runner(cfg, params, mesh=_mesh(1, 2))
    assert tp_run.tp_specs is not None, "tp sharding did not engage"
    out_tp = np.asarray(tp_run.inference(
        noises=noises, conditions=conds, texts_pos=[txt], texts_neg=[txt],
        cfg_scale=1.0, steps=1)[0])

    np.testing.assert_allclose(out_tp, out_ref, rtol=2e-5, atol=2e-5)


def test_tp_with_dp_batches():
    """dp2 x tp2: two batches shard over dp while each chip pair runs
    tp-sharded weights; both outputs must equal the single-device run."""
    cfg = small_test_config()
    params = init_dit_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    noises, blurs, txt = _inputs(cfg, b=2, seed=3)

    base = _runner(cfg, params)
    conds = [base.get_condition(n, b) for n, b in zip(noises, blurs)]
    ref = [np.asarray(o) for o in base.inference(
        noises=noises, conditions=conds, texts_pos=[txt], texts_neg=[txt],
        cfg_scale=1.0, steps=1)]

    tp_run = _runner(cfg, params, mesh=_mesh(2, 2))
    assert tp_run.tp_specs is not None
    got = [np.asarray(o) for o in tp_run.inference(
        noises=noises, conditions=conds, texts_pos=[txt], texts_neg=[txt],
        cfg_scale=1.0, steps=1)]
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-5, atol=2e-5)


def _psnr(got, ref):
    from seedvr2_tpu.utils.parity import psnr

    return psnr(got, ref, data_range=float(np.max(np.abs(ref))) or 1.0)


def _one_step(runner, noises, conds, txt):
    return np.asarray(runner.inference(
        noises=noises, conditions=conds, texts_pos=[txt], texts_neg=[txt],
        cfg_scale=1.0, steps=1)[0])


@pytest.mark.parametrize("quant", ["q8", "q4k", "w8a8"])
def test_tp_quantized_lanes(quant):
    """Quantized serving trees shard over tp like dense ones (the 7B w8a8
    production lane must scale past one chip). q8/qa are weight-only:
    tp output == single-device output up to fp32 psum reduction order.
    w8a8 row-sharded projections quantize activations per LOCAL K-slice
    (a finer scale grid than the single-chip full-K absmax), so the gate
    is accuracy vs the dense fp32 forward: the tp lane must be at least
    as close as the single-chip lane, minus a small slack."""
    from seedvr2_tpu.ops.int8_matmul import quantize_dit_params_w8a8
    from seedvr2_tpu.ops.quant_matmul import (quantize_dit_params,
                                              quantize_dit_params_affine4)

    cfg = small_test_config()
    dense = init_dit_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    if quant == "q8":
        params = quantize_dit_params(dense, min_dim=16)
    elif quant == "q4k":
        params = quantize_dit_params_affine4(dense, min_dim=16)
    else:
        params = quantize_dit_params_w8a8(dense, min_dim=16, align=16)
    assert params is not dense and tp_compatible(params, cfg, 2)
    noises, blurs, txt = _inputs(cfg, seed=5)

    base = _runner(cfg, params)
    conds = [base.get_condition(n, b) for n, b in zip(noises, blurs)]
    out_single = _one_step(base, noises, conds, txt)

    tp_run = _runner(cfg, params, mesh=_mesh(1, 2))
    assert tp_run.tp_specs is not None, "tp sharding did not engage"
    out_tp = _one_step(tp_run, noises, conds, txt)

    if quant in ("q8", "q4k"):
        np.testing.assert_allclose(out_tp, out_single, rtol=1e-4, atol=1e-4)
    else:
        out_dense = _one_step(_runner(cfg, dense), noises,
                              [base.get_condition(n, b)
                               for n, b in zip(noises, blurs)], txt)
        p_single = _psnr(out_single, out_dense)
        p_tp = _psnr(out_tp, out_dense)
        assert p_tp >= p_single - 2.0, (p_tp, p_single)
