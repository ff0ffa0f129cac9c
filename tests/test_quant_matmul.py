"""Fused Q8_0 dequant-matmul kernel correctness (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from seedvr2_tpu.ops.quant_matmul import (dequantize_q8, quant_matmul_q8,
                                          quantize_q8)


def test_quant_matmul_matches_dequant_reference():
    rng = np.random.default_rng(0)
    m, k, n = 48, 128, 96
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    q, scales = quantize_q8(w)

    ref = np.asarray(x @ dequantize_q8(q, scales))
    out = np.asarray(quant_matmul_q8(
        x, q, scales, block_m=16, block_n=32, block_k=64, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_affine_quant_matmul_matches_dequant():
    """quant_matmul_affine (native Q4_K serving: w = s*q - m per 32-group)
    vs explicit dequant + matmul."""
    from seedvr2_tpu.ops.quant_matmul import quant_matmul_affine

    rng = np.random.default_rng(7)
    m, k, n = 48, 128, 96
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    q = jnp.asarray(rng.integers(0, 16, (k, n)), jnp.int8)
    s = jnp.asarray(rng.uniform(0.01, 0.1, (k // 32, n)), jnp.float32)
    mn = jnp.asarray(rng.uniform(0.0, 0.5, (k // 32, n)), jnp.float32)

    w = (np.asarray(q, np.float32).reshape(k // 32, 32, n)
         * np.asarray(s)[:, None, :]
         - np.asarray(mn)[:, None, :]).reshape(k, n)
    ref = np.asarray(x) @ w
    out = np.asarray(quant_matmul_affine(
        x, q, s, mn, block_m=16, block_n=32, block_k=64, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # layers.linear routing for the "qa" layout
    from seedvr2_tpu.ops.layers import linear

    out2 = np.asarray(linear(x, {"qa": q, "s": s, "m": mn}))
    np.testing.assert_allclose(out2, ref, rtol=1e-4, atol=2e-4)


def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    q, s = quantize_q8(w)
    rel = np.abs(np.asarray(dequantize_q8(q, s) - w)).max() / \
        np.abs(np.asarray(w)).max()
    assert rel < 0.01  # int8 per-32-group quantization error


def test_quant_linear_routing():
    """layers.linear must route {"q8"} params through the kernel (validated
    here via the interpret-mode kernel on the same inputs)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 7, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    q, s = quantize_q8(w)
    b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)

    ref = np.asarray(x @ dequantize_q8(q, s) + b)
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
    k, n = branch["q8"].shape
    assert branch["scales"].shape == (k // 32, n)
    # small/IO layers stay dense (vid_in proj has a sub-threshold in-dim)
    assert "w" in qparams["vid_in"]["proj"]
    # 1D norm params untouched
    assert "weight" in qparams["vid_out_norm"]


def test_gguf_keep_q8_layout(tmp_path):
    """GGUF keep_q8 load emits the kernel layout and dequantizes equal to the
    full-dequant load."""
    import struct

    from seedvr2_tpu.ops import gguf as g

    rng = np.random.default_rng(3)
    out_dim, in_dim = 8, 64
    blocks = []
    for _ in range(out_dim * in_dim // 32):
        d = np.float16(rng.uniform(0.5, 2.0))
        qv = rng.integers(-127, 127, 32, dtype=np.int8)
        blocks.append(d.tobytes() + qv.tobytes())
    data = b"".join(blocks)
    name = b"blocks.0.w"
    path = tmp_path / "q8.gguf"
    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 0))
        f.write(struct.pack("<Q", len(name)) + name)
        f.write(struct.pack("<I", 2))
        f.write(struct.pack("<QQ", in_dim, out_dim))  # gguf innermost first
        f.write(struct.pack("<I", g.Q8_0))
        f.write(struct.pack("<Q", 0))
        pos = f.tell()
        f.write(b"\0" * ((32 - pos % 32) % 32))
        f.write(data)

    dense = g.load_gguf_state_dict(str(path))[name.decode()]  # (out, in)
    quant = g.load_gguf_state_dict(str(path), keep_q8=True)[name.decode()]
    assert quant["q8"].shape == (in_dim, out_dim)
    assert quant["scales"].shape == (in_dim // 32, out_dim)
    deq = np.asarray(dequantize_q8(jnp.asarray(quant["q8"]),
                                   jnp.asarray(quant["scales"])))
    np.testing.assert_allclose(deq, dense.T, rtol=1e-5, atol=1e-6)
