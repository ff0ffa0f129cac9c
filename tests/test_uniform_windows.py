"""Uniform padded window partition (TPU fast path) vs the grouped path.

The uniform partition (models/dit/windows.py build_uniform_plan) must be
*exactly* the reference's ragged window partition: same window memberships,
same per-window softmax (pad kv masked out), same RoPE coordinates
(including the coordinate restart in front-clipped shifted windows). The
grouped path is oracle-verified against the PyTorch reference
(test_dit_parity.py), so grouped == uniform closes the chain at sizes too
large for the torch oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seedvr2_tpu.core.configs import DiTConfig
from seedvr2_tpu.models.dit.nadit import (build_dit_plan, init_dit_params,
                                          nadit_forward)
from seedvr2_tpu.models.dit.windows import (WINDOW_FNS, build_uniform_plan,
                                            _window_extents)


SIZES = [(2, 18, 32), (5, 17, 29), (1, 45, 80), (4, 30, 52), (13, 24, 40)]


@pytest.mark.parametrize("method", ["window", "shifted_window"])
@pytest.mark.parametrize("size", SIZES)
def test_uniform_membership_identity(size, method):
    """Every uniform window holds exactly one reference window's tokens."""
    nw_tgt = (4, 3, 3)
    up = build_uniform_plan(size, nw_tgt, method)
    t, h, w = size
    padded = [s + f + b for s, (f, b) in zip(size, up.pads)]
    grid = np.full(padded, -1, np.int64)
    (ft, _), (fh, _), (fw, _) = up.pads
    grid[ft:ft + t, fh:fh + h, fw:fw + w] = np.arange(t * h * w).reshape(size)
    nt, nh, nw = up.nwin
    wt, wh, ww = up.wshape
    g = grid.reshape(nt, wt, nh, wh, nw, ww).transpose(0, 2, 4, 1, 3, 5)
    g = g.reshape(up.num_windows, -1)

    ref_grid = np.arange(t * h * w).reshape(size)
    ref = [frozenset(ref_grid[s].reshape(-1).tolist())
           for s in WINDOW_FNS[method](size, nw_tgt)]
    got = []
    for i in range(up.num_windows):
        toks = g[i]
        assert ((toks >= 0) == up.kv_valid[i]).all()
        got.append(frozenset(toks[toks >= 0].tolist()))
    assert len(got) == len(ref)
    assert sorted(map(sorted, got)) == sorted(map(sorted, ref))


def _small_cfg(family):
    if family == "dit_3b":
        return DiTConfig(
            family="dit_3b", vid_in_channels=9, vid_out_channels=4,
            vid_dim=24, txt_in_dim=16, heads=2, head_dim=12, expand_ratio=4,
            norm_eps=1e-5, qk_bias=False, patch_size=(1, 2, 2), num_layers=4,
            mm_layers=2, mlp_type="swiglu", window=(4, 3, 3),
            rope_type="mmrope3d", rope_dim=12, vid_out_norm=True)
    return DiTConfig(
        family="dit_7b", vid_in_channels=9, vid_out_channels=4, vid_dim=24,
        txt_in_dim=16, heads=2, head_dim=12, expand_ratio=4, norm_eps=1e-5,
        qk_bias=False, patch_size=(1, 2, 2), num_layers=4, mm_layers=0,
        mlp_type="normal", window=(4, 3, 3), rope_type="rope3d_window",
        rope_dim=6, vid_out_norm=False, shared_qkv=False, shared_mlp=False)


@pytest.mark.parametrize("family", ["dit_3b", "dit_7b"])
@pytest.mark.parametrize("shape", [(3, 16, 22), (2, 34, 58), (5, 12, 20)])
def test_uniform_equals_grouped_forward(family, shape):
    """Full NaDiT forward: uniform partition == grouped partition (fp32).

    Shapes chosen so shifted layers produce front-clipped windows (offset
    rope tables) and clipped trailing windows (masked kv) in h/w/t."""
    cfg = _small_cfg(family)
    T, H, W = shape
    txt_len = 7
    params = init_dit_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(11)
    vid = jnp.asarray(rng.standard_normal((2, T, H, W, 9), dtype=np.float32))
    txt = jnp.asarray(rng.standard_normal((2, txt_len, 16), dtype=np.float32))
    ts = jnp.asarray([500.0, 37.0])

    plan_g = build_dit_plan(cfg, (T, H, W), txt_len, uniform=False)
    plan_u = build_dit_plan(cfg, (T, H, W), txt_len, uniform=True)
    out_g = np.asarray(nadit_forward(params, cfg, vid, txt, ts, plan_g))
    out_u = np.asarray(nadit_forward(params, cfg, vid, txt, ts, plan_u))
    np.testing.assert_allclose(out_u, out_g, rtol=2e-5, atol=2e-5)


def test_uniform_plan_dedup_is_small():
    """Boundary-pattern dedup keeps table counts tiny at production sizes."""
    from seedvr2_tpu.models.dit.nadit import _build_uniform_attn_plan

    cfg = _small_cfg("dit_3b")
    # 4K-output latent grid (bench.py shape after patchify)
    plan = _build_uniform_attn_plan(cfg, (2, 135, 240), 58, "shifted_window")
    assert plan.cos.shape[0] <= 27
    assert plan.ids.shape == (plan.up.num_windows,)
    assert plan.valid.shape[1] == plan.up.window_len + 58


def test_uniform_tp_quantized_forward():
    """The uniform path under tensor parallelism with a QUANTIZED tree:
    local head count must derive from the projection output (the q8/w8a8
    layouts have no "w" field — regression for a trace-time KeyError).
    q8 is weight-only, so tp == single-device up to psum reduction order."""
    from jax.sharding import Mesh, PartitionSpec as P

    from seedvr2_tpu.ops.quant_matmul import quantize_dit_params
    from seedvr2_tpu.parallel.tp import tp_compatible, tp_shard_dit_params

    cfg = DiTConfig(
        family="dit_3b", vid_in_channels=9, vid_out_channels=4,
        vid_dim=32, txt_in_dim=16, heads=2, head_dim=32, expand_ratio=4,
        norm_eps=1e-5, qk_bias=False, patch_size=(1, 2, 2), num_layers=2,
        mm_layers=1, mlp_type="swiglu", window=(4, 3, 3),
        rope_type="mmrope3d", rope_dim=32, vid_out_norm=True)
    params = quantize_dit_params(
        init_dit_params(jax.random.PRNGKey(5), cfg, dtype=jnp.float32),
        min_dim=16)
    assert any("q8" in b for blk in params["blocks"]
               for b in blk["attn"]["proj_qkv"].values())
    assert tp_compatible(params, cfg, 2)

    T, H, W, txt_len = 3, 16, 22, 7
    plan_u = build_dit_plan(cfg, (T, H, W), txt_len, uniform=True)
    rng = np.random.default_rng(13)
    vid = jnp.asarray(rng.standard_normal((1, T, H, W, 9), dtype=np.float32))
    txt = jnp.asarray(rng.standard_normal((1, txt_len, 16), dtype=np.float32))
    ts = jnp.asarray([500.0])

    ref = np.asarray(nadit_forward(params, cfg, vid, txt, ts, plan_u))

    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(1, 2), ("dp", "tp"))
    sharded, specs = tp_shard_dit_params(mesh, params, cfg)

    def fwd(p, v, t, s):
        return nadit_forward(p, cfg, v, t, s, plan_u, tp_axis="tp")

    out = jax.shard_map(fwd, mesh=mesh,
                        in_specs=(specs, P(), P(), P()), out_specs=P(),
                        check_vma=False)(sharded, vid, txt, ts)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
