"""Golden-parity tests: JAX NaDiT vs the PyTorch reference (CPU oracle).

Tiny configurations, shared random weights, fp32 on both sides. This is the
strongest correctness evidence for the DiT stack: window partition math, RoPE
tables (including the 3B text-offset), MM weight sharing, AdaSingle
modulation (incl. the vid_out cache-collision quirk), and the attention path.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from seedvr2_tpu.core.configs import DiTConfig
from seedvr2_tpu.core.loader import torch_module_to_params
from seedvr2_tpu.models.dit.nadit import build_dit_plan, nadit_forward

from .oracle_ref import load_reference_src


def _make_pair_3b(T=3, H=8, W=10, txt_len=7, seed=0, vid_dim=24,
                  head_dim=12):
    """Tiny seeded reference NaDiT + our config/params on the same weights.

    vid_dim/head_dim are parameterizable so quantization tests can use
    32-aligned dims (Q8_0/affine grouping is per 32 along K) while the
    default parity shapes stay as cheap as possible."""
    load_reference_src()
    import importlib

    nadit_mod = importlib.import_module("refsrc.models.dit_3b.nadit")
    torch.manual_seed(seed)
    ref = nadit_mod.NaDiT(
        vid_in_channels=9, vid_out_channels=4, vid_dim=vid_dim,
        txt_in_dim=16, txt_dim=vid_dim, emb_dim=6 * vid_dim, heads=2,
        head_dim=head_dim, expand_ratio=4,
        norm="fusedrms", norm_eps=1e-5, ada="single", qk_bias=False,
        qk_norm="fusedrms", patch_size=(1, 2, 2), num_layers=2,
        block_type="mmdit_sr", mm_layers=1, mlp_type="swiglu",
        rope_type="mmrope3d", rope_dim=head_dim, window=(2, 2, 2),
        window_method=["720pwin_by_size_bysize", "720pswin_by_size_bysize"],
        vid_out_norm="fusedrms", txt_in_norm=None,
    ).float().eval()

    cfg = DiTConfig(
        family="dit_3b", vid_in_channels=9, vid_out_channels=4,
        vid_dim=vid_dim, txt_in_dim=16, heads=2, head_dim=head_dim,
        expand_ratio=4, norm_eps=1e-5,
        qk_bias=False, patch_size=(1, 2, 2), num_layers=2, mm_layers=1,
        mlp_type="swiglu", window=(2, 2, 2), rope_type="mmrope3d",
        rope_dim=head_dim, vid_out_norm=True,
    )
    params = torch_module_to_params(ref, dtype=jnp.float32)
    return ref, cfg, params


@pytest.mark.parametrize("shape", [(3, 8, 10), (1, 6, 6), (5, 12, 8)])
def test_nadit_3b_matches_reference(shape):
    T, H, W = shape
    txt_len = 7
    ref, cfg, params = _make_pair_3b(T, H, W, txt_len)

    rng = np.random.default_rng(42)
    vid = rng.standard_normal((T, H, W, 9), dtype=np.float32)
    txt = rng.standard_normal((txt_len, 16), dtype=np.float32)
    timestep = 500.0

    # reference: flattened (L, c) + shape tensors
    vid_t = torch.from_numpy(vid.reshape(-1, 9))
    with torch.no_grad():
        out_ref = ref(
            vid_t, torch.from_numpy(txt),
            torch.tensor([[T, H, W]]), torch.tensor([[txt_len]]),
            timestep=torch.tensor([timestep]),
        ).vid_sample.numpy().reshape(T, H, W, 4)

    plan = build_dit_plan(cfg, (T, H, W), txt_len)
    out_jax = nadit_forward(
        params, cfg,
        jnp.asarray(vid)[None], jnp.asarray(txt)[None],
        jnp.asarray([timestep]), plan,
    )
    out_jax = np.asarray(out_jax[0])

    np.testing.assert_allclose(out_jax, out_ref, rtol=2e-3, atol=2e-3)
    # BASELINE.md criterion: PSNR parity with the PyTorch reference.
    rng_span = out_ref.max() - out_ref.min()
    rmse = np.sqrt(np.mean((out_jax - out_ref) ** 2))
    psnr = 20 * np.log10(rng_span / max(rmse, 1e-12))
    assert psnr > 60, f"PSNR vs reference too low: {psnr:.1f} dB"


def test_nadit_7b_matches_reference():
    load_reference_src()
    import importlib

    nadit_mod = importlib.import_module("refsrc.models.dit_7b.nadit")
    torch.manual_seed(1)
    ref = nadit_mod.NaDiT(
        vid_in_channels=9, vid_out_channels=4, vid_dim=24, txt_in_dim=16,
        txt_dim=24, emb_dim=144, heads=2, head_dim=12, expand_ratio=4,
        norm="fusedrms", norm_eps=1e-5, ada="single", qk_bias=False,
        qk_rope=True, qk_norm="fusedrms", patch_size=(1, 2, 2), num_layers=2,
        block_type="mmdit_sr", shared_qkv=False, shared_mlp=False,
        mlp_type="normal", window=(2, 2, 2),
        window_method=["720pwin_by_size_bysize", "720pswin_by_size_bysize"],
    ).float().eval()

    cfg = DiTConfig(
        family="dit_7b", vid_in_channels=9, vid_out_channels=4, vid_dim=24,
        txt_in_dim=16, heads=2, head_dim=12, expand_ratio=4, norm_eps=1e-5,
        qk_bias=False, patch_size=(1, 2, 2), num_layers=2, mm_layers=0,
        mlp_type="normal", window=(2, 2, 2), rope_type="rope3d_window",
        rope_dim=6, vid_out_norm=False, shared_qkv=False, shared_mlp=False,
    )
    params = torch_module_to_params(ref, dtype=jnp.float32)

    T, H, W, txt_len = 3, 8, 10, 7
    rng = np.random.default_rng(7)
    vid = rng.standard_normal((T, H, W, 9), dtype=np.float32)
    txt = rng.standard_normal((txt_len, 16), dtype=np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(vid.reshape(-1, 9)), torch.from_numpy(txt),
            torch.tensor([[T, H, W]]), torch.tensor([[txt_len]]),
            timestep=torch.tensor([300.0]),
        ).vid_sample.numpy().reshape(T, H, W, 4)

    plan = build_dit_plan(cfg, (T, H, W), txt_len)
    out_jax = np.asarray(nadit_forward(
        params, cfg, jnp.asarray(vid)[None], jnp.asarray(txt)[None],
        jnp.asarray([300.0]), plan,
    )[0])

    np.testing.assert_allclose(out_jax, out_ref, rtol=2e-3, atol=2e-3)
