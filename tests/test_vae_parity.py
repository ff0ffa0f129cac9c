"""Golden-parity tests: JAX causal video VAE vs the PyTorch reference oracle.

Covers: causal conv head-extension, temporal down/upsampling (+remove_head),
per-frame group norm, mid-block spatial attention, temporal slicing with
functional state threading (vs the reference's mutable conv memory), and the
posterior-mode latent.
"""

import importlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from seedvr2_tpu.core.configs import VAEConfig
from seedvr2_tpu.core.loader import torch_module_to_params
from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE

from .oracle_ref import load_reference_src

CH = (8, 8, 16, 16)
GROUPS = 4
LATENT = 4


@pytest.fixture(scope="module")
def pair():
    load_reference_src()
    vae_mod = importlib.import_module(
        "refsrc.models.video_vae_v3.modules.attn_video_vae")
    torch.manual_seed(3)
    ref = vae_mod.VideoAutoencoderKLWrapper(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock3D",) * 4,
        up_block_types=("UpDecoderBlock3D",) * 4,
        block_out_channels=CH, layers_per_block=1,
        latent_channels=LATENT, norm_num_groups=GROUPS,
        temporal_scale_num=2, slicing_sample_min_size=4,
        use_quant_conv=False, use_post_quant_conv=False,
        spatial_downsample_factor=8, temporal_downsample_factor=4,
        freeze_encoder=False, inflation_mode="tail",
        time_receptive_field="full",
    ).float().eval()

    cfg = VAEConfig(block_out_channels=CH, layers_per_block=1,
                    latent_channels=LATENT, norm_num_groups=GROUPS)
    ref.debug = None  # reference tiled paths read self.debug (set by its pipeline)
    params = torch_module_to_params(ref, dtype=jnp.float32)
    vae = VideoVAE(params, cfg, dtype=jnp.float32)
    return ref, vae


def _encode_ref(ref, x_tchw):
    with torch.no_grad():
        return ref.encode(torch.from_numpy(x_tchw)).latent.numpy()


def test_encode_parity_single_slice(pair):
    ref, vae = pair
    rng = np.random.default_rng(0)
    T, H, W = 5, 32, 24
    x = rng.uniform(-1, 1, (1, 3, T, H, W)).astype(np.float32)

    lat_ref = _encode_ref(ref, x)  # (B, C, Tl, h, w)
    lat_jax = np.asarray(vae.encode(jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    lat_jax = lat_jax.transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(lat_jax, lat_ref, rtol=2e-3, atol=2e-3)


def test_decode_parity_single_slice(pair):
    ref, vae = pair
    rng = np.random.default_rng(1)
    Tl, h, w = 2, 4, 3
    z = rng.standard_normal((1, LATENT, Tl, h, w)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.decode(torch.from_numpy(z)).sample.numpy()
    out_jax = np.asarray(vae.decode(jnp.asarray(z.transpose(0, 2, 3, 4, 1))))
    out_jax = out_jax.transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_jax, out_ref, rtol=5e-3, atol=5e-3)
    # BASELINE.md criterion: PSNR parity with the PyTorch reference.
    span = out_ref.max() - out_ref.min()
    rmse = np.sqrt(np.mean((out_jax - out_ref) ** 2))
    psnr = 20 * np.log10(span / max(rmse, 1e-12))
    assert psnr > 60, f"decode PSNR vs reference too low: {psnr:.1f} dB"


def test_encode_parity_sliced(pair):
    """T=9 forces the slicing path on both sides (split 5 + 4)."""
    ref, vae = pair
    ref.set_causal_slicing(split_size=4, memory_device="same")
    rng = np.random.default_rng(2)
    T, H, W = 9, 24, 16
    x = rng.uniform(-1, 1, (1, 3, T, H, W)).astype(np.float32)

    lat_ref = _encode_ref(ref, x)
    lat_jax = np.asarray(vae.encode(jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    lat_jax = lat_jax.transpose(0, 4, 1, 2, 3)
    assert lat_jax.shape == lat_ref.shape
    np.testing.assert_allclose(lat_jax, lat_ref, rtol=2e-3, atol=2e-3)


def test_decode_parity_sliced(pair):
    ref, vae = pair
    ref.set_causal_slicing(split_size=4, memory_device="same")
    rng = np.random.default_rng(3)
    z = rng.standard_normal((1, LATENT, 3, 4, 3)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.decode(torch.from_numpy(z)).sample.numpy()
    out_jax = np.asarray(vae.decode(jnp.asarray(z.transpose(0, 2, 3, 4, 1))))
    out_jax = out_jax.transpose(0, 4, 1, 2, 3)
    assert out_jax.shape == out_ref.shape
    np.testing.assert_allclose(out_jax, out_ref, rtol=5e-3, atol=5e-3)


def test_uniform_tile_mode_close_to_untiled(pair):
    """tile_mode='uniform' (even same-shape grid, the product default) must
    stay close to the untiled result on both encode and decode, and must
    produce exactly one tile shape."""
    import jax.numpy as jnp

    _, vae = pair
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 1, 48, 56, 3)).astype(np.float32))
    full = np.asarray(vae.encode(x))
    uni = np.asarray(vae.encode(x, tiled=True, tile_size=(32, 32),
                                tile_overlap=(16, 16), tile_mode="uniform"))
    assert uni.shape == full.shape
    # random (untrained) VAE amplifies seam noise; trained weights blend far
    # tighter — this guards against layout bugs, not seam quality
    assert np.abs(uni - full).mean() < 0.25
    assert len({(h, w) for (_, _, h, w) in vae.last_encode_tiles}) == 1

    z = jnp.asarray(rng.standard_normal((1, 1, 10, 14, 4)).astype(np.float32))
    fulld = np.asarray(vae.decode(z))
    unid = np.asarray(vae.decode(z, tiled=True, tile_size=(64, 64),
                                 tile_overlap=(32, 32), tile_mode="uniform"))
    assert unid.shape == fulld.shape
    assert np.abs(unid - fulld).mean() < 0.2
    assert len({(h, w) for (_, _, h, w) in vae.last_decode_tiles}) == 1


def test_decode_tiled_scan_matches_eager(pair):
    """The single-jit lax.scan tiled decode (uniform grid, no mesh) must
    equal the eager per-tile loop (exercised via a 1-device mesh)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    _, vae = pair
    rng = np.random.default_rng(17)
    z = jnp.asarray(rng.standard_normal((1, 2, 10, 14, 4)).astype(np.float32))
    scan_out = np.asarray(vae.decode(z, tiled=True, tile_size=(64, 64),
                                     tile_overlap=(32, 32),
                                     tile_mode="uniform"))
    try:
        vae.mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
        eager = np.asarray(vae.decode(z, tiled=True, tile_size=(64, 64),
                                      tile_overlap=(32, 32),
                                      tile_mode="uniform"))
    finally:
        vae.mesh = None
    np.testing.assert_allclose(scan_out, eager, rtol=1e-5, atol=1e-5)


def test_fused_norm_silu_head_matches_composition():
    """Pallas fused groupnorm+silu+causal-head (interpret mode) vs the
    unfused jnp composition it replaces on TPU."""
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.ops.fused_norm import (norm_silu_head,
                                            norm_silu_head_reference)

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((2, 3, 12, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    fused = np.asarray(norm_silu_head(x, w, b, groups=4, head_frames=2,
                                      interpret=True))
    ref = np.asarray(norm_silu_head_reference(x, w, b, groups=4,
                                              head_frames=2))
    assert fused.shape == ref.shape == (2, 5, 12, 16, 8)
    np.testing.assert_allclose(fused, ref, rtol=2e-5, atol=2e-5)
    # head frames repeat the processed frame 0
    np.testing.assert_array_equal(fused[:, 0], fused[:, 1])
    np.testing.assert_allclose(fused[:, 1], fused[:, 2], rtol=2e-5,
                               atol=2e-5)

    # odd H exercises the hb=1 divisor path
    x2 = jnp.asarray(rng.standard_normal((1, 2, 7, 16, 8)).astype(np.float32))
    f2 = np.asarray(norm_silu_head(x2, w, b, groups=4, interpret=True))
    r2 = np.asarray(norm_silu_head_reference(x2, w, b, groups=4))
    np.testing.assert_allclose(f2, r2, rtol=2e-5, atol=2e-5)


def test_plan_grid_properties():
    """_plan_grid: coverage, area cap, overlap floor, single shape; and it
    beats the stride sweep's compute on the 4K decode grid."""
    from seedvr2_tpu.models.vae.pipeline_vae import _min_overlap, _plan_grid

    for (h, w, cap, ov) in [(270, 480, 136 * 136, 16), (48, 48, 16 * 16, 4),
                            (17, 300, 64 * 64, 8), (5, 5, 100, 2)]:
        ys, th, xs, tw = _plan_grid(h, w, cap, ov, ov)
        assert th * tw <= max(cap, th * tw if len(ys) == len(xs) == 1 else 0) \
            or th * tw <= cap
        assert ys[0] == 0 and xs[0] == 0
        assert ys[-1] + th == h or len(ys) == 1 and th == h
        assert xs[-1] + tw == w or len(xs) == 1 and tw == w
        if len(ys) > 1:
            assert _min_overlap(ys, th) >= ov
        if len(xs) > 1:
            assert _min_overlap(xs, tw) >= ov

    # 4K: 3x3 tiles of 101x171 = 1.20x compute vs the sweep's 1.71x
    ys, th, xs, tw = _plan_grid(270, 480, 136 * 136, 16, 16)
    waste = len(ys) * len(xs) * th * tw / (270 * 480)
    assert waste < 1.25


def test_tiled_encode_close_to_untiled(pair):
    """Tiled encode must agree with untiled away from tile seams (the
    reference accepts small seam differences; we check overall closeness)."""
    _, vae = pair
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 1, 48, 48, 3)).astype(np.float32))
    full = np.asarray(vae.encode(x))
    tiled = np.asarray(vae.encode(x, tiled=True, tile_size=(32, 32),
                                  tile_overlap=(16, 16)))
    assert tiled.shape == full.shape
    diff = np.abs(tiled - full).mean()
    assert diff < 0.15, f"tiled encode diverged: mean|diff|={diff}"


def test_tiled_encode_parity_vs_reference(pair):
    """Tiled encode vs the reference tiled_encode (cosine fades, accumulate/
    normalize, latent-space tile math)."""
    ref, vae = pair
    ref.set_causal_slicing(split_size=4, memory_device="same")
    rng = np.random.default_rng(7)
    T, H, W = 1, 96, 96
    x = rng.uniform(-1, 1, (1, 3, T, H, W)).astype(np.float32)

    with torch.no_grad():
        lat_ref = ref.encode(torch.from_numpy(x), tiled=True,
                             tile_size=(64, 64),
                             tile_overlap=(16, 16)).latent.numpy()
    lat_jax = np.asarray(vae.encode(
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)), tiled=True,
        tile_size=(64, 64), tile_overlap=(16, 16)))
    lat_jax = lat_jax.transpose(0, 4, 1, 2, 3)
    # reference squeezes the temporal dim for single frames
    if lat_ref.ndim == 4:
        lat_ref = lat_ref[:, :, None]
    np.testing.assert_allclose(lat_jax, lat_ref, rtol=3e-3, atol=3e-3)


def test_tiled_decode_parity_vs_reference(pair):
    ref, vae = pair
    ref.set_causal_slicing(split_size=4, memory_device="same")
    rng = np.random.default_rng(8)
    z = rng.standard_normal((1, LATENT, 1, 16, 16)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.decode(torch.from_numpy(z), tiled=True,
                             tile_size=(96, 96),
                             tile_overlap=(32, 32)).sample.numpy()
    out_jax = np.asarray(vae.decode(
        jnp.asarray(z.transpose(0, 2, 3, 4, 1)), tiled=True,
        tile_size=(96, 96), tile_overlap=(32, 32)))
    out_jax = out_jax.transpose(0, 4, 1, 2, 3)
    if out_ref.ndim == 4:
        out_ref = out_ref[:, :, None]
    np.testing.assert_allclose(out_jax, out_ref, rtol=5e-3, atol=5e-3)


def test_chunked_spatial_attention_matches_dense():
    """Online-softmax chunked path == dense path (exercised for S > 4096)."""
    import jax

    from seedvr2_tpu.models.vae import model as vae_model

    rng = np.random.default_rng(9)
    b, s, c = 2, 5000, 16
    q = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    chunked = vae_model._spatial_attention(q, k, v, scale=c ** -0.5)
    old = vae_model._ATTN_CHUNK
    try:
        vae_model._ATTN_CHUNK = 10000  # force dense
        dense = vae_model._spatial_attention(q, k, v, scale=c ** -0.5)
    finally:
        vae_model._ATTN_CHUNK = old
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_mesh_tile_parallel_matches_sequential(pair):
    """Tile-parallel tiled encode/decode over an 8-device mesh must equal
    the sequential tile loop exactly (tiles are independent; sharding only
    changes placement). Runs on the virtual CPU mesh from conftest."""
    import jax
    from jax.sharding import Mesh

    _, vae = pair
    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, (1, 5, 96, 128, 3)).astype(np.float32)
    z = rng.standard_normal((1, 2, 16, 24, LATENT)).astype(np.float32)

    seq_enc = np.asarray(vae.encode(jnp.asarray(x), tiled=True,
                                    tile_size=(64, 64), tile_overlap=(16, 16)))
    seq_dec = np.asarray(vae.decode(jnp.asarray(z), tiled=True,
                                    tile_size=(96, 96), tile_overlap=(32, 32)))
    try:
        vae.mesh = Mesh(np.array(jax.devices()), ("dp",))
        par_enc = np.asarray(vae.encode(jnp.asarray(x), tiled=True,
                                        tile_size=(64, 64),
                                        tile_overlap=(16, 16)))
        par_dec = np.asarray(vae.decode(jnp.asarray(z), tiled=True,
                                        tile_size=(96, 96),
                                        tile_overlap=(32, 32)))
    finally:
        vae.mesh = None
    np.testing.assert_allclose(par_enc, seq_enc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(par_dec, seq_dec, rtol=1e-5, atol=1e-5)


def test_convt_upsample_matches_pixel_shuffle(pair, monkeypatch):
    """SEEDVR2_UPSAMPLE_CONVT=1 (upsample as one lhs-dilated conv) must
    reproduce the stock einsum + pixel-shuffle decode (same math, different
    lowering; tools/tpu_session_r5.py A/Bs the wall time on chip)."""
    from seedvr2_tpu.models.vae import model as M

    _, vae = pair
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 3, LATENT)), jnp.float32)
    # the convt lowering is the DEFAULT: build the pixel-shuffle baseline
    # under an explicit False (a fresh VideoVAE per variant re-traces)
    monkeypatch.setattr(M, "_UPSAMPLE_CONVT", False)
    stock = np.asarray(
        VideoVAE(vae.params, vae.cfg, dtype=jnp.float32).decode(z))
    monkeypatch.setattr(M, "_UPSAMPLE_CONVT", True)
    vae2 = VideoVAE(vae.params, vae.cfg, dtype=jnp.float32)
    convt = np.asarray(vae2.decode(z))
    np.testing.assert_allclose(convt, stock, rtol=2e-5, atol=2e-5)


def test_head_correction_conv_matches_concat(pair, monkeypatch):
    """SEEDVR2_HEAD_CORRECTION=1 (zero-padded conv + tiny head-correction
    conv, no extend_head concat) must reproduce the stock decode/encode
    INCLUDING the sliced paths (state-carried heads)."""
    from seedvr2_tpu.models.vae import model as M

    _, vae = pair
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.standard_normal((1, 3, 4, 3, LATENT)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 9, 32, 24, 3)), jnp.float32)
    stock_dec = np.asarray(vae.decode(z))
    stock_enc = np.asarray(vae.encode(x))
    monkeypatch.setattr(M, "_HEAD_CORRECTION", True)
    vae2 = VideoVAE(vae.params, vae.cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(vae2.decode(z)), stock_dec,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vae2.encode(x)), stock_enc,
                               rtol=2e-5, atol=2e-5)


def test_traces_pin_construction_time_switches(pair, monkeypatch):
    """A VideoVAE must trace under the lowering switches it was constructed
    with, even when a tool mutates the module globals BEFORE the first call
    (the jitted python body only runs at trace time). Regression for the
    _pinned wrapper: without it, the instance's memplan signature and its
    compiled program could describe different lowerings."""
    from seedvr2_tpu.models.vae import model as M

    _, vae = pair
    rng = np.random.default_rng(13)
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 3, LATENT)), jnp.float32)

    monkeypatch.setattr(M, "_UPSAMPLE_CONVT", False)
    monkeypatch.setattr(M, "_HEAD_CORRECTION", False)
    baseline_vae = VideoVAE(vae.params, vae.cfg, dtype=jnp.float32)
    # flip every switch AFTER construction but BEFORE the first (tracing)
    # call. The head-correction path is bit-equal by linearity, so the
    # output comparison below only detects a leaked convt lowering; the
    # head-correction pin is covered by the snapshot asserts at the end.
    monkeypatch.setattr(M, "_UPSAMPLE_CONVT", True)
    monkeypatch.setattr(M, "_HEAD_CORRECTION", True)
    out = np.asarray(baseline_vae.decode(z))

    monkeypatch.setattr(M, "_UPSAMPLE_CONVT", False)
    monkeypatch.setattr(M, "_HEAD_CORRECTION", False)
    fresh = np.asarray(
        VideoVAE(vae.params, vae.cfg, dtype=jnp.float32).decode(z))
    # bit-identical (same lowering, same program), not just allclose
    np.testing.assert_array_equal(out, fresh)

    # and the snapshot is what memplan keys on
    assert baseline_vae._upsample_convt is False
    assert baseline_vae._head_correction is False
