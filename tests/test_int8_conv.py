"""int8 shifted-matmul conv kernel: interpret-mode parity vs lax conv."""

import numpy as np

import jax
import jax.numpy as jnp

from seedvr2_tpu.ops.int8_conv import (int8_causal_conv3d, int8_conv3d,
                                       quantize_conv_weight)


def _ref_conv(x_ext, w, dims=("NDHWC", "DHWIO", "NDHWC")):
    return jax.lax.conv_general_dilated(
        x_ext[None].astype(jnp.float32), w.astype(jnp.float32),
        (1, 1, 1), [(0, 0), (0, 0), (0, 0)], dimension_numbers=dims)[0]


def test_int8_conv3d_matches_dequant_reference():
    """Kernel (interpret) vs fp32 conv on the SAME quantized operands —
    checks the shifted-matmul + halo + rotation indexing, not quantization
    error. Wp=32 exercises the sublane-tile layout."""
    rng = np.random.default_rng(0)
    T, H, Wp, C, Co = 3, 8, 32, 8, 16
    x_ext = jnp.asarray(rng.integers(-127, 128, (T + 2, H + 2, Wp, C)),
                        jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (27, C, Co)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (T,)), jnp.float32)
    ws = jnp.asarray(rng.uniform(0.01, 0.1, (Co,)), jnp.float32)

    out = np.asarray(int8_conv3d(x_ext, wq, xs, ws, hb=4, cob=16,
                                 interpret=True), np.float32)

    w5 = np.asarray(wq, np.float32).reshape(3, 3, 3, C, Co)
    ref = np.asarray(_ref_conv(x_ext, jnp.asarray(w5)), np.float32)
    ref = ref * np.asarray(xs)[:, None, None, None] * np.asarray(ws)
    ref = np.asarray(jnp.asarray(ref).astype(jnp.bfloat16), np.float32)
    assert out.shape == (T, H, Wp - 2, Co)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_int8_causal_conv3d_accuracy():
    """End-to-end int8 causal conv vs the bf16 reference path: quantization
    error must stay in the ~1% class at VAE-like magnitudes."""
    from seedvr2_tpu.models.vae.model import causal_conv3d

    rng = np.random.default_rng(1)
    T, H, W, C, Co = 3, 8, 16, 8, 8
    x = jnp.asarray(rng.standard_normal((1, T, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, Co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.01, jnp.float32)

    ref = np.asarray(causal_conv3d(
        {"c": {"w": w, "b": b}}, "c", x, None, t_pad=1,
        s_pad=((1, 1), (1, 1))), np.float32)
    out = np.asarray(int8_causal_conv3d(x, w, b, hb=4, interpret=True),
                     np.float32)
    assert out.shape == ref.shape
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.03, f"int8 conv rel error {rel}"


def test_vae_decode_conv_quant_int8():
    """conv_quant='int8' (the --vae_quant serving mode) decode must stay
    close to the bf16 decode — same tile layout, quantized resnet convs
    (CPU emulation path computes the same quantized numerics)."""
    from dataclasses import replace

    from seedvr2_tpu.core.configs import VAEConfig
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    # 128-channel blocks: the int8 path requires lane-tileable channel dims
    cfg = VAEConfig(block_out_channels=(128, 128, 128, 128),
                    layers_per_block=1, latent_channels=4,
                    norm_num_groups=32)
    params = init_vae_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 6, 4)), jnp.float32)

    ref = np.asarray(VideoVAE(params, cfg, dtype=jnp.float32).decode(z),
                     np.float32)
    q = np.asarray(VideoVAE(params, replace(cfg, conv_quant="int8"),
                            dtype=jnp.float32).decode(z), np.float32)
    assert q.shape == ref.shape
    rel = np.abs(q - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.15, f"int8 VAE decode rel error {rel}"
    assert np.isfinite(q).all()


def test_norm_silu_quantize_fused_matches_explicit():
    """The 2-pass fused norm+silu+quantize (v2 int8-decode path) must agree
    with the explicit GroupNorm -> SiLU -> quantize chain: the analytic
    scale bound covers the true absmax (no clipping), so the dequantized
    values differ from the explicit float path by at most scale/2."""
    from seedvr2_tpu.models.vae.model import frame_group_norm
    from seedvr2_tpu.ops.int8_conv import norm_silu_quantize

    rng = np.random.default_rng(5)
    T, H, W, C, G = 3, 6, 10, 8, 4
    x = jnp.asarray(rng.standard_normal((1, T, H, W, C)) * 2.0, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (C,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((C,)) * 0.2, jnp.float32)

    x_ext, scale, tail = norm_silu_quantize(x, gamma, beta, G)
    y_ref = jax.nn.silu(frame_group_norm(
        {"n": {"weight": gamma, "b": beta}}, "n", x, G))
    y_ref = np.asarray(y_ref[0], np.float32)

    # scale bound covers the true absmax -> nothing clipped
    s = float(scale)
    assert np.abs(y_ref).max() <= s * 127.0 * (1 + 1e-5)
    # interior (un-padded, post-head) region dequantizes to y_ref +- s/2
    wp = x_ext.shape[2]
    deq = np.asarray(x_ext, np.float32)[2:, 1:-1, 1:W + 1] * s
    assert x_ext.shape == (T + 2, H + 2, wp, C)
    assert np.abs(deq - y_ref).max() <= s * 0.51
    # head rows repeat frame 0 (INITIALIZING semantics)
    np.testing.assert_array_equal(np.asarray(x_ext)[0], np.asarray(x_ext)[2])
    # state tail is the bf16 norm+silu of the last 2 frames
    np.testing.assert_allclose(np.asarray(tail[0], np.float32),
                               y_ref[-2:], rtol=1e-5, atol=1e-5)


def test_norm_silu_quantize_carried_state():
    """ACTIVE slices: the carried head quantizes with the shared scale and
    lands in the extended rows; the scale also covers the head's absmax."""
    from seedvr2_tpu.ops.int8_conv import norm_silu_quantize

    rng = np.random.default_rng(6)
    T, H, W, C, G = 2, 4, 6, 8, 2
    x = jnp.asarray(rng.standard_normal((1, T, H, W, C)), jnp.float32)
    head = jnp.asarray(rng.standard_normal((1, 2, H, W, C)) * 3.0,
                       jnp.float32)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)

    x_ext, scale, _ = norm_silu_quantize(x, gamma, beta, G, head=head)
    s = float(scale)
    assert np.abs(np.asarray(head)).max() <= s * 127.0 * (1 + 1e-5)
    deq_head = np.asarray(x_ext, np.float32)[:2, 1:-1, 1:W + 1] * s
    np.testing.assert_allclose(deq_head, np.asarray(head[0], np.float32),
                               atol=s * 0.51)


def test_quantize_conv_weight_roundtrip():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 16)), jnp.float32)
    q, s = quantize_conv_weight(w)
    back = np.asarray(q, np.float32) * np.asarray(s)
    ref = np.asarray(w).reshape(27, 8, 16)
    assert np.abs(back - ref).max() / np.abs(ref).max() < 0.01


def test_int8_conv3d_multi_column_block():
    """C=512 at W=286 forces the 2D grid's column split (n_w=2 with halo
    padding): checks the wb-block DMA offsets, the zero halo columns and
    the discarded padded output columns against the fp32 reference."""
    rng = np.random.default_rng(5)
    T, H, W, C, Co = 1, 4, 286, 512, 512
    Wp = 288
    x_ext = jnp.asarray(rng.integers(-127, 128, (T + 2, H + 2, Wp, C)),
                        jnp.int8)
    wq = jnp.asarray(rng.integers(-8, 9, (27, C, Co)), jnp.int8)
    xs = jnp.asarray(rng.uniform(0.01, 0.1, (T,)), jnp.float32)
    ws = jnp.asarray(rng.uniform(0.01, 0.1, (Co,)), jnp.float32)

    out = np.asarray(int8_conv3d(x_ext, wq, xs, ws, interpret=True),
                     np.float32)

    w5 = np.asarray(wq, np.float32).reshape(3, 3, 3, C, Co)
    ref = np.asarray(_ref_conv(x_ext, jnp.asarray(w5)), np.float32)
    ref = ref * np.asarray(xs)[:, None, None, None] * np.asarray(ws)
    ref = np.asarray(jnp.asarray(ref).astype(jnp.bfloat16), np.float32)
    assert out.shape == (T, H, Wp - 2, Co)
    # bf16 one-ulp tolerance: the kernel applies res * (xs*ws) while the
    # reference multiplies the two f32 scales separately; values on a bf16
    # rounding boundary can round apart (~1e-5 of elements)
    np.testing.assert_allclose(out, ref, rtol=8e-3, atol=1e-4)
