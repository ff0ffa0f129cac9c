"""Fused Q8_0 dequant-matmul kernel correctness (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from seedvr2_tpu.ops.quant_matmul import (quant_matmul_q8, quantize_q8,
                                          quant_linear)


def test_quant_matmul_matches_dequant_reference():
    rng = np.random.default_rng(0)
    m, k, n = 48, 128, 96
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    q, scales = quantize_q8(w)

    # reference: dequantize then plain matmul
    w_deq = (q.astype(jnp.float32).reshape(n, k // 32, 32)
             * scales[:, :, None]).reshape(n, k)
    ref = np.asarray(x @ w_deq.T)

    out = np.asarray(quant_matmul_q8(
        x, q, scales, block_m=16, block_n=32, block_k=64, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    q, s = quantize_q8(w)
    w_deq = (q.astype(jnp.float32).reshape(64, 8, 32)
             * s[:, :, None]).reshape(64, 256)
    rel = np.abs(np.asarray(w_deq - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # int8 per-32-group quantization error


def test_quant_linear_routing():
    """layers.linear must route {"q8"} params through the kernel."""
    from seedvr2_tpu.ops.layers import linear

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 7, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
    q, s = quantize_q8(w)
    b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)

    # interpret-mode via direct call (CPU backend can't run mosaic)
    ref_w = (q.astype(jnp.float32).reshape(32, 2, 32) * s[:, :, None]
             ).reshape(32, 64)
    ref = np.asarray(x @ ref_w.T + b)
    out_flat = quant_matmul_q8(x.reshape(-1, 64), q, s, block_m=8,
                               block_n=32, block_k=64, interpret=True)
    out = np.asarray(out_flat).reshape(4, 7, 32) + np.asarray(b)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_quantize_dit_params_structure():
    from seedvr2_tpu.core.configs import small_test_config
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.ops.quant_matmul import quantize_dit_params

    cfg = small_test_config(vid_dim=64, heads=2, head_dim=32, num_layers=2)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_dit_params(params, min_dim=64)
    blk = qparams["blocks"][0]["attn"]["proj_qkv"]
    branch = blk.get("all") or blk.get("vid")
    assert "q8" in branch and "scales" in branch
    n, k = branch["q8"].shape
    assert branch["scales"].shape == (n, k // 32)
    # small/IO layers stay dense (vid_in proj has a sub-threshold in-dim)
    assert "w" in qparams["vid_in"]["proj"]
    # 1D norm params untouched
    assert "weight" in qparams["vid_out_norm"]
