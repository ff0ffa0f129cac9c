"""2D->3D conv inflation at VAE load (VERDICT r4 item 5).

The reference inflates 2D-stored conv weights into its 3D causal convs in
`InflatedCausalConv3d._load_from_state_dict` (src/models/video_vae_v3/
modules/causal_inflation_lib.py:440-495, "tail"/"replicate" modes). Our
loader does the same transformation eagerly in `inflate_vae_2d_convs`,
against the target architecture's kernel geometry recovered from
`vae_template_shapes`. These tests verify:

  1. inflation semantics bit-match the reference's own load path (oracle);
  2. an inflated 2D checkpoint and a 3D checkpoint of the same weights
     produce identical VideoVAE parameters end-to-end through
     load_vae_checkpoint;
  3. clear errors for un-inflatable checkpoints.
"""

import importlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from seedvr2_tpu.core.configs import VAEConfig
from seedvr2_tpu.core.loader import (inflate_vae_2d_convs,
                                     vae_template_shapes)

from .oracle_ref import load_reference_src

CH = (8, 8, 16, 16)
GROUPS = 4
LATENT = 4

CFG = VAEConfig(block_out_channels=CH, layers_per_block=1,
                latent_channels=LATENT, norm_num_groups=GROUPS)


def _small_ref_vae(inflation_mode="tail"):
    load_reference_src()
    vae_mod = importlib.import_module(
        "refsrc.models.video_vae_v3.modules.attn_video_vae")
    torch.manual_seed(7)
    ref = vae_mod.VideoAutoencoderKLWrapper(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock3D",) * 4,
        up_block_types=("UpDecoderBlock3D",) * 4,
        block_out_channels=CH, layers_per_block=1,
        latent_channels=LATENT, norm_num_groups=GROUPS,
        temporal_scale_num=2, slicing_sample_min_size=4,
        use_quant_conv=False, use_post_quant_conv=False,
        spatial_downsample_factor=8, temporal_downsample_factor=4,
        freeze_encoder=False, inflation_mode=inflation_mode,
        time_receptive_field="full",
    ).float().eval()
    return ref


def _make_2d_state(ref, rng):
    """A checkpoint storing every InflatedCausalConv3d weight as its 2D
    (O,I,kh,kw) counterpart (image-VAE layout), everything else unchanged.

    Only InflatedCausalConv3d carries the reference's inflation load hook
    (causal_inflation_lib.py:440-495); plain nn.Conv3d modules such as
    Upsample3D.upscale_conv (attn_video_vae.py:94) are video-native and are
    never 2D-stored — the reference itself cannot load them 2D."""
    infl_mod = importlib.import_module(
        "refsrc.models.video_vae_v3.modules.causal_inflation_lib")
    inflatable = {
        f"{name}.weight" for name, m in ref.named_modules()
        if isinstance(m, infl_mod.InflatedCausalConv3d)}
    state = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    for k, v in state.items():
        if k in inflatable and v.ndim == 5:
            o, i, _, kh, kw = v.shape
            state[k] = torch.from_numpy(
                rng.standard_normal((o, i, kh, kw)).astype(np.float32))
    return state


@pytest.mark.parametrize("mode", ["tail", "replicate"])
def test_inflation_oracle_bitexact(mode):
    """Our eager inflation == the reference module's load-time inflation."""
    ref = _small_ref_vae(inflation_mode=mode)
    rng = np.random.default_rng(11)
    state_2d = _make_2d_state(ref, rng)

    # Reference path: load_state_dict routes each 2D weight through
    # modify_state_dict/inflate_weight inside the conv's own hook.
    ref.load_state_dict(state_2d, strict=False)
    ref_inflated = {k: v.detach().numpy()
                    for k, v in ref.state_dict().items()}

    # Our path: eager inflation of the same flat dict.
    ours = inflate_vae_2d_convs(
        {k: v.numpy() for k, v in state_2d.items()}, CFG, mode=mode)

    checked = 0
    for k, v_ref in ref_inflated.items():
        if k.endswith(".weight") and v_ref.ndim == 5:
            np.testing.assert_array_equal(
                ours[k], v_ref, err_msg=f"inflation mismatch at {k}")
            checked += 1
    assert checked > 10  # the small VAE has dozens of causal convs


def test_2d_checkpoint_loads_like_3d(tmp_path):
    """load_vae_checkpoint on a 2D-stored checkpoint == loading the same
    checkpoint pre-inflated to 3D."""
    from safetensors.numpy import save_file

    from seedvr2_tpu.core import model_manager

    ref = _small_ref_vae()
    rng = np.random.default_rng(13)
    state_2d = {k: v.numpy() for k, v in _make_2d_state(ref, rng).items()}
    state_3d = inflate_vae_2d_convs(dict(state_2d), CFG, mode="tail")

    p2, p3 = str(tmp_path / "vae2d.safetensors"), str(
        tmp_path / "vae3d.safetensors")
    save_file(state_2d, p2)
    save_file(state_3d, p3)

    params2, cfg2 = model_manager.load_vae_checkpoint(p2, jnp.float32)
    params3, cfg3 = model_manager.load_vae_checkpoint(p3, jnp.float32)
    assert cfg2 == cfg3
    import jax

    leaves2 = jax.tree_util.tree_leaves_with_path(params2)
    leaves3 = dict(jax.tree_util.tree_leaves_with_path(params3))
    # tree_leaves_with_path returns (path, leaf) pairs
    leaves3 = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_leaves_with_path(params3)}
    for path, v2 in leaves2:
        np.testing.assert_array_equal(
            np.asarray(v2), np.asarray(leaves3[jax.tree_util.keystr(path)]))


def test_template_shapes_match_reference_module():
    """vae_template_shapes reproduces the reference module's exact
    torch-layout shapes for the same architecture."""
    ref = _small_ref_vae()
    template = vae_template_shapes(CFG)
    ref_shapes = {k: tuple(v.shape) for k, v in ref.state_dict().items()
                  if k.endswith((".weight", ".bias"))}
    missing = []
    for k, s in ref_shapes.items():
        if template.get(k) != s:
            missing.append((k, s, template.get(k)))
    assert not missing, f"template disagreements: {missing[:5]}"


def test_uninflatable_checkpoints_raise_clearly():
    # aux 4D tensors the model never reads (discriminator/LPIPS heads, EMA
    # shadows in training exports) are carried through uninflated, not fatal
    aux = np.zeros((4, 3, 3, 3), np.float32)
    with pytest.warns(UserWarning, match="no counterpart"):
        out = inflate_vae_2d_convs({"encoder.bogus_conv.weight": aux}, CFG)
    assert out["encoder.bogus_conv.weight"].shape == aux.shape
    with pytest.raises(ValueError, match="incompatible"):
        # right key, wrong channel count
        inflate_vae_2d_convs(
            {"encoder.conv_in.weight": np.zeros((99, 3, 3, 3),
                                                np.float32)}, CFG)
    with pytest.raises(ValueError, match="inflation mode"):
        inflate_vae_2d_convs({}, CFG, mode="bogus")
