"""Fused producer-quantize kernels (ops/fused_quant.py).

Parity targets: the unfused chain rms_norm -> _ada_in ->
quantize_activations (and silu*up -> quantize) that these kernels replace
in the w8a8 serving path. The fused kernels run the producer math in fp32
(the unfused chain rounds to bf16 mid-way), so dequantized comparisons use
a one-quantum tolerance rather than bit equality."""

import _bootstrap  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvr2_tpu.ops.fused_quant import (PreQuantized, rms_ada_quantize,
                                         silu_mul_quantize)
from seedvr2_tpu.ops.int8_matmul import quantize_activations


def _explicit_rms_ada(x, scale, shift, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)) * scale[:, None, :] \
        + shift[:, None, :]


@pytest.mark.parametrize("interpret", [False, True],
                         ids=["fallback", "kernel"])
def test_rms_ada_quantize_matches_explicit(interpret):
    rng = np.random.default_rng(0)
    B, L, K = 2, 96, 256  # L % 32 == 0, K % 256 == 0 -> kernel-eligible
    x = jnp.asarray(rng.standard_normal((B, L, K)) * 1.7, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (B, K)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((B, K)) * 0.3, jnp.float32)

    out = rms_ada_quantize(x, scale, shift, eps=1e-5, interpret=interpret)
    assert isinstance(out, PreQuantized)
    assert out.q.shape == (B, L, K) and out.q.dtype == jnp.int8
    assert out.s.shape == (B, L)

    y = np.asarray(_explicit_rms_ada(x, scale, shift, 1e-5))
    s = np.asarray(out.s, np.float32)
    # per-row scale covers the row absmax (no clipping)
    assert (np.abs(y).max(axis=-1) <= s * 127.0 * (1 + 1e-5)).all()
    deq = np.asarray(out.q, np.float32) * s[..., None]
    assert np.abs(deq - y).max() <= s.max() * 0.51


def test_rms_ada_quantize_matches_unfused_w8a8_chain():
    """Against the chain it replaces in nadit (bf16 producer + per-row
    quantize): dequantized activations agree to ~the int8 quantum."""
    from seedvr2_tpu.models.dit.nadit import _ada_in
    from seedvr2_tpu.ops.layers import rms_norm

    rng = np.random.default_rng(1)
    B, L, K = 1, 64, 256
    x = jnp.asarray(rng.standard_normal((B, L, K)), jnp.bfloat16)
    ada = {"attn_scale": jnp.asarray(rng.uniform(0.8, 1.2, (K,)),
                                     jnp.float32),
           "attn_shift": jnp.asarray(rng.standard_normal((K,)) * 0.1,
                                     jnp.float32)}
    sa = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.float32)
    ss = jnp.asarray(rng.uniform(-0.1, 0.1, (B, K)), jnp.float32)

    fused = rms_ada_quantize(
        x, ss + ada["attn_scale"][None], sa + ada["attn_shift"][None],
        eps=1e-5)
    h = _ada_in(rms_norm(x, 1e-5), sa, ss, ada, "attn")
    q_ref, s_ref = quantize_activations(h.reshape(-1, K))

    deq_f = np.asarray(fused.q, np.float32).reshape(-1, K) \
        * np.asarray(fused.s, np.float32).reshape(-1, 1)
    deq_r = np.asarray(q_ref, np.float32) * np.asarray(s_ref)[:, None]
    # bf16 producer rounding differs; both land within ~1 quantum
    tol = 2.1 * max(np.asarray(fused.s).max(), np.asarray(s_ref).max())
    assert np.abs(deq_f - deq_r).max() <= tol
    assert fused.dtype == jnp.bfloat16


@pytest.mark.parametrize("interpret", [False, True],
                         ids=["fallback", "kernel"])
def test_silu_mul_quantize_matches_explicit(interpret):
    rng = np.random.default_rng(2)
    B, L, K = 1, 64, 512
    g = jnp.asarray(rng.standard_normal((B, L, K)) * 2.0, jnp.float32)
    u = jnp.asarray(rng.standard_normal((B, L, K)), jnp.float32)

    out = silu_mul_quantize(g, u, interpret=interpret)
    y = np.asarray(jax.nn.silu(g.astype(jnp.float32))
                   * u.astype(jnp.float32))
    s = np.asarray(out.s, np.float32)
    assert (np.abs(y).max(axis=-1) <= s * 127.0 * (1 + 1e-5)).all()
    deq = np.asarray(out.q, np.float32) * s[..., None]
    assert np.abs(deq - y).max() <= s.max() * 0.51


def test_prequantized_through_linear_and_double_linear():
    """PreQuantized inputs flow through ops.layers.linear and
    w8a8_double_linear and agree with the float-input w8a8 path."""
    from seedvr2_tpu.ops.int8_matmul import (quantize_weight_w8a8,
                                             w8a8_double_linear)
    from seedvr2_tpu.ops.layers import linear

    rng = np.random.default_rng(3)
    B, L, K, N = 1, 64, 256, 128
    x = jnp.asarray(rng.standard_normal((B, L, K)), jnp.float32)
    w1 = rng.standard_normal((K, N)).astype(np.float32)
    w2 = rng.standard_normal((K, N)).astype(np.float32)
    q1, s1 = quantize_weight_w8a8(w1)
    q2, s2 = quantize_weight_w8a8(w2)
    p1 = {"w8a8": jnp.asarray(q1), "ws": jnp.asarray(s1)}
    p2 = {"w8a8": jnp.asarray(q2), "ws": jnp.asarray(s2)}

    xq, xs = quantize_activations(x)
    pre = PreQuantized(xq, xs, jnp.float32)

    np.testing.assert_allclose(np.asarray(linear(pre, p1)),
                               np.asarray(linear(x, p1)), rtol=1e-6)
    a_pre, b_pre = w8a8_double_linear(pre, p1, p2)
    a_ref, b_ref = w8a8_double_linear(x, p1, p2)
    np.testing.assert_allclose(np.asarray(a_pre), np.asarray(a_ref),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b_pre), np.asarray(b_ref),
                               rtol=1e-6)

    with pytest.raises(TypeError):
        linear(pre, {"w": jnp.asarray(w1)})
