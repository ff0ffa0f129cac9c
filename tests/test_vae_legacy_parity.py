"""Golden-parity tests: the LEGACY causal video VAE family vs the PyTorch
reference oracle.

The reference ships an older, attention-free VAE
(src/models/video_vae_v3/modules/video_vae.py VideoAutoencoderKL) alongside
the modern attn_video_vae one. It is not wired into the published configs,
but its structural deltas are real model-family features:

 - no mid-block spatial attention (video_vae.py:440-466),
 - optional 1x1x1 causal quant/post-quant convs (video_vae.py:765-784),
 - time_receptive_field="half": resnet conv2 is a depth-1 (1,3,3) kernel
   (video_vae.py:273-280).

On our side all three are VAEConfig switches over the SAME functional
encoder/decoder cores (models/vae/model.py) — the temporal pad is derived
per conv from the stored kernel depth, so "half" checkpoints need no extra
code path. These tests close SURVEY.md §2.2's last inventory row by proving
the config variant reproduces the reference legacy class bit-for-bit-ish
(fp32 tolerance), sliced and unsliced, and that the loader sniffs a legacy
state dict into the right config.
"""

import importlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from seedvr2_tpu.core.configs import VAEConfig
from seedvr2_tpu.core.loader import sniff_vae_config, torch_module_to_params
from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

from .oracle_ref import load_reference_src

# legacy ResnetBlock2D hardcodes GroupNorm(num_groups=32)
# (video_vae.py:74-82), so the tiny config's channels must be >= 32
CH = (32, 32, 64)
LATENT = 4


@pytest.fixture(scope="module")
def pair():
    load_reference_src()
    vae_mod = importlib.import_module(
        "refsrc.models.video_vae_v3.modules.video_vae")
    torch.manual_seed(7)
    ref = vae_mod.VideoAutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=CH,
        layers_per_block=1, latent_channels=LATENT,
        use_quant_conv=True, use_post_quant_conv=True,
        enc_selective_checkpointing=("none",) * len(CH),
        dec_selective_checkpointing=("none",) * len(CH),
        temporal_scale_num=2, slicing_up_num=0, inflation_mode="tail",
        time_receptive_field="half", slicing_sample_min_size=4,
        spatial_downsample_factor=4, temporal_downsample_factor=4,
    ).float().eval()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = sniff_vae_config(state, VAEConfig())
    params = torch_module_to_params(ref, dtype=jnp.float32)
    vae = VideoVAE(params, cfg, dtype=jnp.float32)
    return ref, vae, cfg


def _moments_ref(ref, x_tchw):
    """Deterministic encoder moments (ref.encode() would SAMPLE the
    posterior); the latent mode is the first half of the channels."""
    with torch.no_grad():
        h = ref.slicing_encode(torch.from_numpy(x_tchw))
    return torch.chunk(h, 2, dim=1)[0].numpy()


def test_sniffed_config(pair):
    _, _, cfg = pair
    assert cfg.block_out_channels == CH
    assert cfg.latent_channels == LATENT
    assert cfg.temporal_scale_num == 2
    assert cfg.mid_attention is False
    assert cfg.use_quant_conv is True
    assert cfg.use_post_quant_conv is True
    assert cfg.time_receptive_field == "half"
    assert cfg.spatial_downsample_factor == 4
    assert cfg.temporal_downsample_factor == 4


def test_encode_parity_single_slice(pair):
    ref, vae, _ = pair
    rng = np.random.default_rng(10)
    x = rng.uniform(-1, 1, (1, 3, 5, 16, 12)).astype(np.float32)

    z_ref = _moments_ref(ref, x)
    z_jax = np.asarray(vae.encode(jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    z_jax = z_jax.transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(z_jax, z_ref, rtol=2e-3, atol=2e-3)


def test_decode_parity_single_slice(pair):
    ref, vae, _ = pair
    rng = np.random.default_rng(11)
    z = rng.standard_normal((1, LATENT, 2, 4, 3)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.decode(torch.from_numpy(z)).sample.numpy()
    out_jax = np.asarray(vae.decode(jnp.asarray(z.transpose(0, 2, 3, 4, 1))))
    out_jax = out_jax.transpose(0, 4, 1, 2, 3)
    assert out_jax.shape == out_ref.shape
    np.testing.assert_allclose(out_jax, out_ref, rtol=5e-3, atol=5e-3)


def test_encode_parity_sliced(pair):
    """T=9 forces the slicing path (split 5 + 4) — exercises the functional
    state threading through the depth-1 conv2 (which must carry NO state)."""
    ref, vae, _ = pair
    ref.set_causal_slicing(split_size=4, memory_device="same")
    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, (1, 3, 9, 12, 16)).astype(np.float32)

    z_ref = _moments_ref(ref, x)
    z_jax = np.asarray(vae.encode(jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    z_jax = z_jax.transpose(0, 4, 1, 2, 3)
    assert z_jax.shape == z_ref.shape
    np.testing.assert_allclose(z_jax, z_ref, rtol=2e-3, atol=2e-3)


def test_decode_parity_sliced(pair):
    ref, vae, _ = pair
    ref.set_causal_slicing(split_size=4, memory_device="same")
    rng = np.random.default_rng(13)
    z = rng.standard_normal((1, LATENT, 3, 3, 4)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref.decode(torch.from_numpy(z)).sample.numpy()
    out_jax = np.asarray(vae.decode(jnp.asarray(z.transpose(0, 2, 3, 4, 1))))
    out_jax = out_jax.transpose(0, 4, 1, 2, 3)
    assert out_jax.shape == out_ref.shape
    np.testing.assert_allclose(out_jax, out_ref, rtol=5e-3, atol=5e-3)


def test_init_params_match_reference_layout(pair):
    """init_vae_params under the legacy config produces the reference
    class's exact key set and torch-layout shapes (the contract the 2D->3D
    inflation template and config sniffing rely on)."""
    ref, _, cfg = pair
    import jax

    tree = jax.eval_shape(lambda k: init_vae_params(k, cfg),
                          jax.random.PRNGKey(0))

    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{k}.")
        else:
            flat[prefix[:-1]] = tuple(node.shape)

    walk(tree, "")

    ref_state = ref.state_dict()
    for k, v in ref_state.items():
        ours = (k.replace(".weight", ".w") if v.ndim == 5
                else k.replace(".weight", ".weight")).replace(".bias", ".b")
        assert ours in flat, f"missing param for {k}"
        shape = flat[ours]
        if v.ndim == 5:  # torch (co, ci, kt, kh, kw) -> ours (kt, kh, kw, ci, co)
            shape = (shape[4], shape[3], shape[0], shape[1], shape[2])
        assert shape == tuple(v.shape), f"{k}: {shape} != {tuple(v.shape)}"
    # no extras either (e.g. attention params must be absent)
    n_ref = len(ref_state)
    assert len(flat) == n_ref, f"{len(flat)} params vs reference {n_ref}"
