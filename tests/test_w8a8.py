"""w8a8 int8 matmul: kernel semantics (interpret mode) + accuracy bounds."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seedvr2_tpu.ops.int8_matmul import (int8_matmul, quantize_activations,
                                         quantize_weight_w8a8, w8a8_linear)


def _ref_int8_matmul(xq, wq, xs, ws):
    acc = xq.astype(np.int64) @ wq.astype(np.int64)
    return acc.astype(np.float32) * xs[:, None] * ws[None, :]


@pytest.mark.parametrize("m,k,n", [(64, 512, 256), (130, 256, 512)])
def test_int8_matmul_interpret_exact(m, k, n):
    rng = np.random.default_rng(0)
    xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
    wq = rng.integers(-127, 128, (k, n)).astype(np.int8)
    xs = rng.random(m).astype(np.float32) * 0.1
    ws = rng.random(n).astype(np.float32) * 0.05
    got = np.asarray(int8_matmul(
        jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(xs), jnp.asarray(ws),
        out_dtype=jnp.float32, block_m=64, block_n=256, block_k=256,
        interpret=True))
    ref = _ref_int8_matmul(xq, wq, xs, ws)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_int8_matmul_qx_interpret_matches_two_step():
    """In-kernel quantizing matmul == explicit quantize + int8 matmul."""
    from seedvr2_tpu.ops.int8_matmul import int8_matmul_qx

    rng = np.random.default_rng(4)
    m, k, n = 96, 512, 256
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)).astype(np.int8))
    ws = jnp.asarray((rng.random(n).astype(np.float32) * 0.05))

    xq, xs = quantize_activations(x)
    ref = _ref_int8_matmul(np.asarray(xq), np.asarray(wq),
                           np.asarray(xs), np.asarray(ws))
    got = np.asarray(int8_matmul_qx(x, wq, ws, out_dtype=jnp.float32,
                                    block_m=32, block_n=128, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((100, 256)).astype(np.float32))
    xq, xs = quantize_activations(x)
    back = np.asarray(xq, np.float32) * np.asarray(xs)[:, None]
    err = np.abs(back - np.asarray(x))
    # per-row quantization step = amax/127; error <= step/2
    step = np.abs(np.asarray(x)).max(axis=1) / 127.0
    assert (err <= step[:, None] * 0.5 + 1e-6).all()


def test_quantize_dit_params_w8a8_tree():
    """Tree conversion hits big linears only and the model still runs close
    to the float forward (CPU: kernel in interpret mode is exercised above;
    here the XLA-int8 fallback semantics ride through jnp.dot... so we only
    check the converter's structure + a single converted linear)."""
    from seedvr2_tpu.ops.int8_matmul import quantize_dit_params_w8a8

    rng = np.random.default_rng(3)
    params = {
        "blocks": [{
            "attn": {"proj_qkv": {"all": {
                "w": rng.standard_normal((1024, 3072)).astype(np.float32) * 0.02,
                "b": np.zeros(3072, np.float32)}}},
            "small": {"w": rng.standard_normal((16, 1024)).astype(np.float32)},
        }],
    }
    out = quantize_dit_params_w8a8(params, min_dim=1024)
    big = out["blocks"][0]["attn"]["proj_qkv"]["all"]
    assert "w8a8" in big and big["w8a8"].dtype == jnp.int8
    assert big["ws"].shape == (3072,) and "b" in big
    assert "w" in out["blocks"][0]["small"]  # untouched

    # converted q8 trees requantize per-channel
    from seedvr2_tpu.ops.quant_matmul import quantize_q8
    w = rng.standard_normal((1024, 2048)).astype(np.float32) * 0.02
    q, s = quantize_q8(jnp.asarray(w))
    out2 = quantize_dit_params_w8a8({"lin": {"q8": q, "scales": s}})
    assert "w8a8" in out2["lin"]
    back = (np.asarray(out2["lin"]["w8a8"], np.float32)
            * np.asarray(out2["lin"]["ws"])[None, :])
    assert np.abs(back - w).mean() / np.abs(w).mean() < 0.02


def test_w8a8_full_model_accuracy():
    """Full small-NaDiT forward in w8a8 (CPU int32-exact emulation of the
    kernel) stays close to the fp32 forward — the model-level accuracy
    guardrail for the serving mode."""
    from seedvr2_tpu.core.configs import DiTConfig
    from seedvr2_tpu.models.dit.nadit import (build_dit_plan,
                                              init_dit_params, nadit_forward)
    from seedvr2_tpu.ops.int8_matmul import quantize_dit_params_w8a8

    cfg = DiTConfig(
        family="dit_3b", vid_in_channels=9, vid_out_channels=4, vid_dim=512,
        txt_in_dim=16, heads=4, head_dim=128, expand_ratio=4, norm_eps=1e-5,
        qk_bias=False, patch_size=(1, 2, 2), num_layers=2, mm_layers=1,
        mlp_type="swiglu", window=(2, 2, 2), rope_type="mmrope3d",
        rope_dim=48, vid_out_norm=True)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_dit_params_w8a8(params, min_dim=512)

    rng = np.random.default_rng(5)
    vid = jnp.asarray(rng.standard_normal((1, 2, 8, 12, 9), dtype=np.float32))
    txt = jnp.asarray(rng.standard_normal((1, 7, 16), dtype=np.float32))
    ts = jnp.asarray([500.0])
    plan = build_dit_plan(cfg, (2, 8, 12), 7)
    ref = np.asarray(nadit_forward(params, cfg, vid, txt, ts, plan))
    got = np.asarray(nadit_forward(qparams, cfg, vid, txt, ts, plan))
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.05, f"w8a8 model error too high: {rel:.4f}"


def test_w8a8_linear_close_to_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 512)).astype(np.float32))
    w = rng.standard_normal((512, 256)).astype(np.float32) * 0.02
    wq, ws = quantize_weight_w8a8(w)
    got = np.asarray(w8a8_linear(x, jnp.asarray(wq), jnp.asarray(ws),
                                 interpret=True))
    ref = np.asarray(x) @ w
    # int8 x int8 keeps ~1% relative error on gaussian data
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.02


def test_quantize_weight_device_and_host_paths_agree():
    """quantize_weight_w8a8 takes the jnp path for device-resident arrays
    (no transfer through the tunnel) and numpy for host tensors — both
    must produce identical int8/scale pairs."""
    rng = np.random.default_rng(3)
    w_host = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
    qh, sh = quantize_weight_w8a8(w_host)
    qd, sd = quantize_weight_w8a8(jnp.asarray(w_host))
    np.testing.assert_array_equal(np.asarray(qd), qh)
    np.testing.assert_allclose(np.asarray(sd), sh, rtol=1e-6)
