"""The four SeedVR2 nodes (reference contract: src/interfaces/*.py).

Config dicts carry the exact keys the reference nodes emit, so existing
workflows (example_workflows/*.json in the reference) map 1:1."""

from typing import Any, Dict, Optional

import numpy as np

from ..core import pipeline
from ..core.model_manager import configure_runner
from ..utils.debug import Debug
from ..utils.model_registry import (DEFAULT_DIT, DEFAULT_VAE,
                                    get_available_models)
from ..utils.text_embeds import load_text_embeddings


def _node_tile(v):
    """Node tile-size value -> configure_runner form: 0 or "auto" means
    the memory-probed auto plan (utils/memplan), else (px, px)."""
    if v == 0 or v == "auto":
        return "auto"
    return (int(v),) * 2


class SeedVR2LoadDiTModel:
    """DiT loader node -> config dict (dit_model_loader.py:131-180)."""

    @classmethod
    def execute(cls, model: str = DEFAULT_DIT, device: str = "tpu:0",
                offload_device: str = "none", cache_model: bool = False,
                blocks_to_swap: int = 0, swap_io_components: bool = False,
                attention_mode: str = "flash", quant: str = "none",
                torch_compile_args: Optional[Dict[str, Any]] = None
                ) -> Dict[str, Any]:
        if (blocks_to_swap > 0 or swap_io_components) and \
                offload_device in ("none", device):
            raise ValueError(
                "BlockSwap requires offload_device set and != device")
        if cache_model and offload_device == "none":
            raise ValueError("cache_model requires offload_device")
        return {
            "model": model,
            "device": device,
            "offload_device": offload_device,
            "cache_model": cache_model,
            "blocks_to_swap": blocks_to_swap,
            "swap_io_components": swap_io_components,
            "attention_mode": attention_mode,
            "quant": quant,
            "torch_compile_args": torch_compile_args,
        }

    @classmethod
    def available_models(cls, model_dir: Optional[str] = None):
        return get_available_models("dit", model_dir)


class SeedVR2LoadVAEModel:
    """VAE loader node -> config dict (vae_model_loader.py:165-215)."""

    @classmethod
    def execute(cls, model: str = DEFAULT_VAE, device: str = "tpu:0",
                offload_device: str = "none", cache_model: bool = False,
                encode_tiled: bool = False, encode_tile_size: int = 512,
                encode_tile_overlap: int = 64, decode_tiled: bool = False,
                decode_tile_size: int = 512, decode_tile_overlap: int = 64,
                tile_debug: str = "false", tile_mode: str = "uniform",
                torch_compile_args: Optional[Dict[str, Any]] = None
                ) -> Dict[str, Any]:
        if cache_model and offload_device == "none":
            raise ValueError("cache_model requires offload_device")
        return {
            "model": model,
            "device": device,
            "offload_device": offload_device,
            "cache_model": cache_model,
            "encode_tiled": encode_tiled,
            "encode_tile_size": encode_tile_size,
            "encode_tile_overlap": encode_tile_overlap,
            "decode_tiled": decode_tiled,
            "decode_tile_size": decode_tile_size,
            "decode_tile_overlap": decode_tile_overlap,
            "tile_debug": tile_debug,
            "tile_mode": tile_mode,
            "torch_compile_args": torch_compile_args,
        }

    @classmethod
    def available_models(cls, model_dir: Optional[str] = None):
        return get_available_models("vae", model_dir)


class SeedVR2TorchCompileSettings:
    """Compile settings node (torch_compile_settings.py:97-122). On TPU all
    of this is subsumed by jit; the dict is preserved for workflow compat and
    mapped onto jax persistent-compilation-cache controls."""

    @classmethod
    def execute(cls, backend: str = "inductor", mode: str = "default",
                fullgraph: bool = False, dynamic: bool = False,
                dynamo_cache_size_limit: int = 64,
                dynamo_recompile_limit: int = 128) -> Dict[str, Any]:
        return {
            "backend": backend,
            "mode": mode,
            "fullgraph": fullgraph,
            "dynamic": dynamic,
            "dynamo_cache_size_limit": dynamo_cache_size_limit,
            "dynamo_recompile_limit": dynamo_recompile_limit,
        }


class SeedVR2VideoUpscaler:
    """Main upscaler node: frames (N, H, W, C) [0,1] -> upscaled frames
    (video_upscaler.py:225-560), with weighted progress reporting
    (enc .2 / up .25 / dec .5 / post .05)."""

    PHASE_WEIGHTS = {"Phase 1: Encoding": 0.2, "Phase 2: Upscaling": 0.25,
                     "Phase 3: Decoding": 0.5, "Phase 4: Post-processing": 0.05}

    @classmethod
    def execute(cls, image: np.ndarray, dit: Dict[str, Any],
                vae: Dict[str, Any], seed: int, resolution: int = 1080,
                max_resolution: int = 0, batch_size: int = 5,
                uniform_batch_size: bool = False, temporal_overlap: int = 0,
                prepend_frames: int = 0, color_correction: str = "wavelet",
                input_noise_scale: float = 0.0,
                latent_noise_scale: float = 0.0,
                offload_device: str = "none", enable_debug: bool = False,
                model_dir: str = "./models",
                progress_callback=None) -> np.ndarray:
        debug = Debug(enabled=enable_debug)

        runner = configure_runner(
            dit_model=dit["model"], vae_model=vae["model"],
            base_cache_dir=model_dir, debug=debug,
            dit_cache=dit.get("cache_model", False),
            vae_cache=vae.get("cache_model", False),
            block_swap_config={
                "blocks_to_swap": dit.get("blocks_to_swap", 0),
                "swap_io_components": dit.get("swap_io_components", False),
            },
            encode_tiled=vae.get("encode_tiled", False),
            # tile_size: int px side, or 0 / "auto" = memory-probed plan
            # (utils/memplan) — node widgets are numeric, so 0 is the
            # node-friendly spelling of "auto"
            encode_tile_size=_node_tile(vae.get("encode_tile_size", 512)),
            encode_tile_overlap=(vae.get("encode_tile_overlap", 64),) * 2,
            decode_tiled=vae.get("decode_tiled", False),
            decode_tile_size=_node_tile(vae.get("decode_tile_size", 512)),
            decode_tile_overlap=(vae.get("decode_tile_overlap", 64),) * 2,
            attention_mode=dit.get("attention_mode", "flash"),
            quant=dit.get("quant", "none"),
            tile_mode=vae.get("tile_mode", "uniform"),
        )

        frames = np.asarray(image, dtype=np.float32)
        if prepend_frames > 0:
            frames = pipeline.pad_video_temporal(frames, count=prepend_frames,
                                                 prepend=True)

        def weighted_progress(cur, total, _frames, phase):
            if progress_callback is None:
                return
            done = 0.0
            for name, w in cls.PHASE_WEIGHTS.items():
                if name == phase:
                    done += w * (cur / max(total, 1))
                    break
                done += w
            progress_callback(done)

        ctx = pipeline.setup_generation_context(debug=debug,
                                                model_dir=model_dir)
        ctx["text_embeds"] = load_text_embeddings(
            [model_dir, "."], debug, txt_dim=runner.dit_cfg.txt_in_dim)
        ctx = pipeline.encode_all_batches(
            runner, ctx, frames, debug=debug, batch_size=batch_size,
            uniform_batch_size=uniform_batch_size, seed=seed,
            progress_callback=weighted_progress,
            temporal_overlap=temporal_overlap, resolution=resolution,
            max_resolution=max_resolution,
            input_noise_scale=input_noise_scale,
            color_correction=color_correction)
        ctx = pipeline.upscale_all_batches(
            runner, ctx, debug=debug, progress_callback=weighted_progress,
            seed=seed, latent_noise_scale=latent_noise_scale,
            cache_model=dit.get("cache_model", False))
        ctx = pipeline.decode_all_batches(
            runner, ctx, debug=debug, progress_callback=weighted_progress,
            cache_model=vae.get("cache_model", False))
        ctx = pipeline.postprocess_all_batches(
            ctx, debug=debug, progress_callback=weighted_progress,
            color_correction=color_correction, prepend_frames=prepend_frames,
            temporal_overlap=temporal_overlap, batch_size=batch_size)
        return ctx["final_video"]
