"""WHOLE-PIPELINE oracle parity: the reference's actual 4-phase pipeline
(src/core/generation_phases.py:171-1467) executed on CPU with tiny seeded
models, compared against this repo's pipeline on the same weights and the
same noise.

This is the strongest zero-egress substitute for real-checkpoint PSNR
validation: unlike the per-module oracles (test_dit_parity / test_vae_parity
/ test_diffusion_parity), it catches ORCHESTRATION-level drift — 4n+1
padding, uniform batching, temporal-overlap Hann blending, SR condition
construction, VAE scale/shift placement, color-fix ordering and the
[-1,1]->[0,1] assembly.

RNG bridging: the two pipelines deliberately use different RNG disciplines
(torch.manual_seed vs jax.random keys), so the diffusion noise cannot match
by seed — and the reference's noise is not even reproducible from the seed
alone (randn_like on the channels-last NON-CONTIGUOUS latent takes a
different CPU sampler path than contiguous randn, yielding a different
stream for the same seed). The per-batch noise actually used by the
reference (generation_phases.py:659-677) is therefore CAPTURED via a spy on
runner.inference and injected into our phase 2 via `noise_override`; VAE
encode sampling is disabled on both sides (use_sample=False -> posterior
mode, infer.py:160-174).
"""

import importlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from seedvr2_tpu.core import pipeline
from seedvr2_tpu.core.configs import RunnerConfig, VAEConfig
from seedvr2_tpu.core.loader import torch_module_to_params
from seedvr2_tpu.core.runner import VideoDiffusionRunner
from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE

from .oracle_ref import load_reference_src
from .test_dit_parity import _make_pair_3b

LATENT = 4
VAE_CH = (8, 8, 16, 16)
VAE_GROUPS = 4
TXT_IN = 16
SEED = 42


def _make_vae_pair():
    load_reference_src()
    vae_mod = importlib.import_module(
        "refsrc.models.video_vae_v3.modules.attn_video_vae")
    torch.manual_seed(3)
    ref = vae_mod.VideoAutoencoderKLWrapper(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock3D",) * 4,
        up_block_types=("UpDecoderBlock3D",) * 4,
        block_out_channels=VAE_CH, layers_per_block=1,
        latent_channels=LATENT, norm_num_groups=VAE_GROUPS,
        temporal_scale_num=2, slicing_sample_min_size=4,
        use_quant_conv=False, use_post_quant_conv=False,
        spatial_downsample_factor=8, temporal_downsample_factor=4,
        freeze_encoder=False, inflation_mode="tail",
        time_receptive_field="full",
    ).float().eval()
    ref.debug = None
    cfg = VAEConfig(block_out_channels=VAE_CH, layers_per_block=1,
                    latent_channels=LATENT, norm_num_groups=VAE_GROUPS)
    params = torch_module_to_params(ref, dtype=jnp.float32)
    return ref, VideoVAE(params, cfg, dtype=jnp.float32)


def _ref_runner_config():
    """The published diffusion/vae config surface the reference runner
    reads (configs_3b/main.yaml), as the omegaconf-stub DictConfig."""
    from omegaconf import DictConfig

    def d(**kw):
        return DictConfig({k: d(**v) if isinstance(v, dict) else v
                           for k, v in kw.items()})

    return d(
        vae=dict(
            dtype="float32", scaling_factor=0.9152, shifting_factor=0.0,
            grouping=False, use_sample=False,
            model=dict(temporal_downsample_factor=4,
                       spatial_downsample_factor=8),
        ),
        diffusion=dict(
            schedule=dict(type="lerp", T=1000.0),
            sampler=dict(type="euler", prediction_type="v_lerp"),
            timesteps=dict(sampling=dict(type="uniform_trailing", steps=50),
                           transform=True),
            cfg=dict(scale=1.0, rescale=0.0),
        ),
    )


def _run_reference(ref_dit, ref_vae, images, text_pos, text_neg, *,
                   batch_size, temporal_overlap, resolution, prepend_frames,
                   color_correction):
    load_reference_src()
    gp = importlib.import_module("refsrc.core.generation_phases")
    gu = importlib.import_module("refsrc.core.generation_utils")
    infer_mod = importlib.import_module("refsrc.core.infer")
    debug_mod = importlib.import_module("refsrc.utils.debug")

    debug = debug_mod.Debug(enabled=False)
    runner = infer_mod.VideoDiffusionInfer(_ref_runner_config(), debug)
    runner.dit = ref_dit
    runner.vae = ref_vae
    runner._dit_checkpoint = None
    runner._vae_checkpoint = None
    runner.tile_debug = "false"

    ctx = gu.setup_generation_context(debug=debug)
    ctx["compute_dtype"] = torch.float32
    ctx["cache_context"] = dict(
        dit_cache=False, vae_cache=False, cached_dit=False, cached_vae=False,
        dit_newly_cached=False, vae_newly_cached=False)
    ctx["text_embeds"] = {"texts_pos": [text_pos], "texts_neg": [text_neg]}

    ctx = gp.encode_all_batches(
        runner, ctx, torch.from_numpy(images), debug,
        batch_size=batch_size, seed=SEED, temporal_overlap=temporal_overlap,
        resolution=resolution, max_resolution=0,
        color_correction=color_correction)

    # spy: record the exact noise tensors phase 2 feeds the DiT, in batch
    # order, for injection into our pipeline (module docstring, RNG bridging)
    captured_noise = []
    orig_inference = runner.inference

    def spy_inference(noises, conditions, **kw):
        captured_noise.append(noises[0].detach().clone().numpy())
        return orig_inference(noises=noises, conditions=conditions, **kw)

    runner.inference = spy_inference
    ctx = gp.upscale_all_batches(runner, ctx, debug, seed=SEED,
                                 latent_noise_scale=0.0)
    runner.inference = orig_inference
    ctx = gp.decode_all_batches(runner, ctx, debug)
    ctx = gp.postprocess_all_batches(
        ctx, debug, color_correction=color_correction,
        prepend_frames=prepend_frames, temporal_overlap=temporal_overlap,
        batch_size=batch_size)
    return ctx["final_video"].float().numpy(), captured_noise


def _run_ours(dit_cfg, dit_params, vae, images, text_pos, text_neg, *,
              batch_size, temporal_overlap, resolution, prepend_frames,
              color_correction, noise_override):
    runner = VideoDiffusionRunner(
        dit_params, dit_cfg, vae,
        RunnerConfig(dit=dit_cfg, vae=vae.cfg), compute_dtype=jnp.float32,
        attention_mode="xla")
    ctx = pipeline.setup_generation_context()
    ctx["text_embeds"] = {"pos": jnp.asarray(text_pos),
                          "neg": jnp.asarray(text_neg)}
    ctx = pipeline.encode_all_batches(
        runner, ctx, images, batch_size=batch_size, seed=SEED,
        temporal_overlap=temporal_overlap, resolution=resolution,
        max_resolution=0, color_correction=color_correction)
    ctx = pipeline.upscale_all_batches(runner, ctx, seed=SEED,
                                       noise_override=noise_override)
    ctx = pipeline.decode_all_batches(runner, ctx)
    ctx = pipeline.postprocess_all_batches(
        ctx, color_correction=color_correction,
        prepend_frames=prepend_frames, temporal_overlap=temporal_overlap,
        batch_size=batch_size)
    return np.asarray(ctx["final_video"], dtype=np.float32)


def _psnr(a, b):
    rmse = np.sqrt(np.mean((a - b) ** 2))
    return 20 * np.log10(1.0 / max(rmse, 1e-12))


@pytest.fixture(scope="module")
def models():
    ref_dit, dit_cfg, dit_params = _make_pair_3b()
    ref_vae, vae = _make_vae_pair()
    rng = np.random.default_rng(11)
    text = rng.standard_normal((7, TXT_IN)).astype(np.float32) * 0.2
    return dict(ref_dit=ref_dit, dit_cfg=dit_cfg, dit_params=dit_params,
                ref_vae=ref_vae, vae=vae, text=text)


@pytest.mark.parametrize(
    "tcase",
    [
        # single batch, no overlap, wavelet color fix (BASELINE config #1
        # shape: simple image-batch upscale)
        dict(frames=5, batch_size=5, temporal_overlap=0, prepend=0,
             color="wavelet"),
        # multi-batch with temporal overlap blending + 4n+1 padding of the
        # trailing batch + prepend removal (streaming shape)
        dict(frames=7, batch_size=5, temporal_overlap=2, prepend=0,
             color="wavelet"),
    ],
    ids=["single_batch_wavelet", "overlap_blend_wavelet"],
)
def test_whole_pipeline_matches_reference(models, tcase):
    rng = np.random.default_rng(5)
    frames = np.clip(
        0.5 + 0.25 * rng.standard_normal((tcase["frames"], 20, 28, 3)),
        0.0, 1.0).astype(np.float32)

    out_ref, ref_noise = _run_reference(
        models["ref_dit"], models["ref_vae"], frames,
        torch.from_numpy(models["text"]), torch.from_numpy(models["text"]),
        batch_size=tcase["batch_size"],
        temporal_overlap=tcase["temporal_overlap"],
        resolution=32, prepend_frames=tcase["prepend"],
        color_correction=tcase["color"])

    out_jax = _run_ours(
        models["dit_cfg"], models["dit_params"], models["vae"], frames,
        models["text"], models["text"],
        batch_size=tcase["batch_size"],
        temporal_overlap=tcase["temporal_overlap"],
        resolution=32, prepend_frames=tcase["prepend"],
        color_correction=tcase["color"], noise_override=ref_noise)

    assert out_ref.shape == out_jax.shape, (out_ref.shape, out_jax.shape)
    psnr = _psnr(out_ref, out_jax)
    # measured ~128 dB (fp32 numerical noise only) — 60 dB leaves margin
    # for BLAS/XLA reduction-order drift while still catching any real
    # orchestration bug (a mis-ordered blend or off-by-one pad craters
    # PSNR to <25 dB)
    assert psnr > 60.0, f"whole-pipeline PSNR vs reference: {psnr:.1f} dB"


# ---------------------------------------------------------------------------
# Quantized serving lanes vs the fp32 oracle (VERDICT r3 #3): every lane the
# CLI exposes (--quant w8a8/q8/q4k) gets an explicit whole-pipeline PSNR
# floor against the reference fp32 output. The CPU emulation of each quant
# matmul is numerically exact (dense dequant / int32 accumulation), so
# these floors measure QUANTIZATION error, not kernel error (kernel==
# emulation is pinned separately in test_w8a8/test_quant_matmul). The
# floors are the accept/reject contract that real-weight validation
# inherits (docs/parity.md).
# ---------------------------------------------------------------------------

# Measured on the tiny 32-dim config (per-matmul relative error on random
# weights is scale-free, so tiny-config pipeline PSNR is representative of
# where each lane's error saturates the output): w8a8 75.7 dB, q8 76.7 dB,
# q4 affine 50.6 dB. Floors leave ~6 dB slack for RNG/platform drift; a
# broken lane (wrong scale placement, off-by-one group) lands <25 dB.
QUANT_PSNR_FLOORS_DB = {"w8a8": 69.0, "q8": 70.0, "q4": 44.0}


def _quantize_lane(dit_params, lane):
    if lane == "w8a8":
        from seedvr2_tpu.ops.int8_matmul import quantize_dit_params_w8a8

        return quantize_dit_params_w8a8(dit_params, min_dim=32, align=32)
    if lane == "q8":
        from seedvr2_tpu.ops.quant_matmul import quantize_dit_params

        return quantize_dit_params(dit_params, min_dim=32)
    if lane == "q4":
        from seedvr2_tpu.ops.quant_matmul import quantize_dit_params_affine4

        return quantize_dit_params_affine4(dit_params, min_dim=32)
    raise ValueError(lane)


@pytest.fixture(scope="module")
def qoracle():
    """fp32 oracle pipeline output on a 32-aligned tiny config (Q8_0/affine
    grouping is per 32 along K — the 24-dim parity config quantizes
    nothing), shared across the three lane tests."""
    ref_dit, dit_cfg, dit_params = _make_pair_3b(vid_dim=32, head_dim=16)
    ref_vae, vae = _make_vae_pair()
    rng = np.random.default_rng(11)
    text = rng.standard_normal((7, TXT_IN)).astype(np.float32) * 0.2
    frames = np.clip(
        0.5 + 0.25 * rng.standard_normal((5, 20, 28, 3)),
        0.0, 1.0).astype(np.float32)
    out_ref, ref_noise = _run_reference(
        ref_dit, ref_vae, frames,
        torch.from_numpy(text), torch.from_numpy(text),
        batch_size=5, temporal_overlap=0, resolution=32,
        prepend_frames=0, color_correction="wavelet")
    return dict(dit_cfg=dit_cfg, dit_params=dit_params, vae=vae, text=text,
                frames=frames, out_ref=out_ref, ref_noise=ref_noise)


@pytest.mark.parametrize("lane", sorted(QUANT_PSNR_FLOORS_DB))
def test_quantized_pipeline_psnr_floor(qoracle, lane):
    qparams = _quantize_lane(qoracle["dit_params"], lane)
    # the conversion must actually quantize the big projections, or the
    # gate is vacuous
    import jax

    flat = jax.tree.leaves(qparams)
    n_int8 = sum(getattr(leaf, "dtype", None) == jnp.int8 for leaf in flat)
    assert n_int8 >= 4, f"{lane}: conversion quantized only {n_int8} leaves"

    out_q = _run_ours(
        qoracle["dit_cfg"], qparams, qoracle["vae"], qoracle["frames"],
        qoracle["text"], qoracle["text"],
        batch_size=5, temporal_overlap=0, resolution=32, prepend_frames=0,
        color_correction="wavelet", noise_override=qoracle["ref_noise"])

    psnr = _psnr(qoracle["out_ref"], out_q)
    floor = QUANT_PSNR_FLOORS_DB[lane]
    assert psnr >= floor, (
        f"--quant {lane} whole-pipeline PSNR vs fp32 oracle: "
        f"{psnr:.1f} dB < floor {floor} dB")
