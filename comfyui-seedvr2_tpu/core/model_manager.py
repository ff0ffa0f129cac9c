"""Model lifecycle: checkpoint -> params -> configured runner (with caching).

Replaces the reference's configure_runner / materialize_model stack
(src/core/model_configuration.py:729-1469, src/core/model_loader.py:84-950).
The TPU design removes the meta-device/lazy-materialization dance: weights
stream host->HBM once (sharded if a mesh is provided), fp8/GGUF storage
formats are expanded at load, and a process-wide cache keeps params and
compiled runners warm across jobs.

BlockSwap/torch.compile knobs from the reference API are accepted for surface
compatibility: compile is implicit (jit), and block offload is unnecessary on
TPU VMs for the shipped models (3B bf16 ~6.6 GB << HBM); the host-tiering
path for larger-than-HBM models lives in ops/offload.py.
"""

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.vae.pipeline_vae import VideoVAE
from ..utils.debug import NULL_DEBUG, Debug
from ..utils.dtypes import COMPUTE_DTYPE
from .configs import DiTConfig, RunnerConfig, VAE_V3, dit_config_for
from .loader import convert_state_dict
from .model_cache import get_global_cache
from .runner import VideoDiffusionRunner

# deprecated diffusers attention key names -> modern
_VAE_KEY_FIXUPS = [
    (re.compile(r"\.query\."), ".to_q."),
    (re.compile(r"\.key\."), ".to_k."),
    (re.compile(r"\.value\."), ".to_v."),
    (re.compile(r"\.proj_attn\."), ".to_out.0."),
]


def _read_safetensors_numpy(path: str) -> Dict[str, np.ndarray]:
    """Read safetensors to host numpy; falls back to torch for dtypes the
    numpy backend can't express (fp8, bf16 in older versions)."""
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    fallback_keys = []
    with safe_open(path, framework="numpy") as f:
        keys = list(f.keys())
        for key in keys:
            try:
                state[key] = f.get_tensor(key)
            except (TypeError, ValueError):
                fallback_keys.append(key)
    if fallback_keys:
        import torch
        from safetensors import safe_open as safe_open_pt

        with safe_open_pt(path, framework="pt") as f:
            for key in fallback_keys:
                t = f.get_tensor(key)
                # fp8 storage upcasts to fp32 host-side; bf16 via ml_dtypes
                state[key] = t.float().numpy()
    return state


def load_dit_checkpoint(path: str, dtype=COMPUTE_DTYPE,
                        keep_quantized: bool = False,
                        quant: str = "none") -> Tuple[dict, DiTConfig]:
    """Serving quantization modes (replaces the reference's GGUF/FP8 dequant
    machinery, src/optimization/gguf_dequant.py / compatibility.py):
      - quant="q8" (or keep_quantized=True): large linears stay int8 with
        Q8_0 block scales; matmuls run the fused dequant->bf16 MXU kernel
        (ops/quant_matmul.py). GGUF checkpoints keep their blocks verbatim;
        float checkpoints are post-training quantized.
      - quant="w8a8": per-channel int8 weights + per-token dynamic int8
        activations on the int8 MXU (ops/int8_matmul.py)."""
    if keep_quantized and quant == "none":
        quant = "q8"
    cfg = dit_config_for(os.path.basename(path))
    if path.endswith(".gguf"):
        from ..ops.gguf import load_gguf_state_dict

        state = load_gguf_state_dict(path, keep_q8=quant in ("q8", "w8a8"))
    elif path.endswith((".pth", ".pt")):
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        raw = raw.get("state_dict", raw)
        state = {k: v.float().numpy() for k, v in raw.items()}
    else:
        state = _read_safetensors_numpy(path)
    if quant in ("w8a8", "q8"):
        # quantize on the HOST: convert_state_dict places arrays on the
        # default (TPU) device, and pulling 6.8 GB back through the dev
        # tunnel for np-side quantization takes tens of minutes. Keep the
        # whole convert+quantize on CPU, then ship the (2x smaller) int8
        # tree to the accelerator in one device_put.
        import jax

        with jax.default_device(jax.devices("cpu")[0]):
            params = convert_state_dict(state, dtype=dtype)
            if quant == "w8a8":
                from ..ops.int8_matmul import quantize_dit_params_w8a8

                params = quantize_dit_params_w8a8(params)
            elif not path.endswith(".gguf"):
                from ..ops.quant_matmul import quantize_dit_params

                params = quantize_dit_params(params)
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = convert_state_dict(state, dtype=dtype)
    return params, cfg


def load_vae_checkpoint(path: str, dtype=COMPUTE_DTYPE) -> dict:
    state = _read_safetensors_numpy(path)
    fixed = {}
    for key, val in state.items():
        if key.startswith("model."):
            key = key[len("model."):]
        for pat, repl in _VAE_KEY_FIXUPS:
            key = pat.sub(repl, key)
        # deprecated conv-style attention projections: (C, C, 1, 1) -> (C, C)
        if val.ndim == 4 and val.shape[2] == val.shape[3] == 1 and \
                any(t in key for t in ("to_q", "to_k", "to_v", "to_out")):
            val = val[:, :, 0, 0]
        fixed[key] = val
    return convert_state_dict(fixed, dtype=dtype)


def configure_runner(
    dit_model: str,
    vae_model: str,
    base_cache_dir: str = "./models",
    debug: Debug = NULL_DEBUG,
    dit_cache: bool = False,
    vae_cache: bool = False,
    block_swap_config: Optional[Dict[str, Any]] = None,
    encode_tiled: bool = False,
    encode_tile_size: Tuple[int, int] = (1024, 1024),
    encode_tile_overlap: Tuple[int, int] = (128, 128),
    decode_tiled: bool = False,
    decode_tile_size: Tuple[int, int] = (1024, 1024),
    decode_tile_overlap: Tuple[int, int] = (128, 128),
    attention_mode: str = "flash",
    compute_dtype=COMPUTE_DTYPE,
    keep_quantized: bool = False,
    quant: str = "none",
    **_compat_kwargs,
) -> VideoDiffusionRunner:
    """Build (or fetch cached) a fully configured runner for a model pair."""
    cache = get_global_cache()
    runner_key = "|".join(map(str, (
        dit_model, vae_model, encode_tiled, encode_tile_size,
        encode_tile_overlap, decode_tiled, decode_tile_size,
        decode_tile_overlap, attention_mode, keep_quantized, quant)))
    cached = cache.get_runner(runner_key)
    if cached is not None:
        debug.log("Reusing cached runner", category="reuse")
        return cached

    from ..utils.constants import find_model_path
    from ..utils.downloads import download_weight

    dit_path = (find_model_path(dit_model, base_cache_dir)
                or download_weight(dit_model, base_cache_dir, debug))
    vae_path = (find_model_path(vae_model, base_cache_dir)
                or download_weight(vae_model, base_cache_dir, debug))

    import jax

    dit_params = cache.get_dit(dit_path) if dit_cache else None
    if dit_params is None:
        with debug.timer("load_dit", "DiT weights load"):
            dit_params, dit_cfg = load_dit_checkpoint(
                dit_path, compute_dtype, keep_quantized=keep_quantized,
                quant=quant)
            # force the host->HBM transfer to complete inside the timer
            # (transfers are async; without this the first jit execution
            # silently absorbs multi-GB upload time)
            jax.block_until_ready(dit_params)
        if dit_cache:
            cache.set_dit(dit_path, dit_params)
    else:
        dit_cfg = dit_config_for(os.path.basename(dit_path))

    vae = cache.get_vae(vae_path) if vae_cache else None
    if vae is None:
        with debug.timer("load_vae", "VAE weights load"):
            vae_params = load_vae_checkpoint(vae_path, compute_dtype)
            jax.block_until_ready(vae_params)
        vae = VideoVAE(vae_params, VAE_V3, dtype=compute_dtype)
        if vae_cache:
            cache.set_vae(vae_path, vae)

    if block_swap_config and block_swap_config.get("blocks_to_swap", 0) > 0:
        debug.log(
            "BlockSwap requested; TPU HBM holds the full model - ignoring "
            "(host weight tiering auto-engages only for larger-than-HBM "
            "models)", category="blockswap", force=True)

    runner = VideoDiffusionRunner(
        dit_params, dit_cfg, vae, RunnerConfig(dit=dit_cfg),
        debug=debug,
        encode_tiled=encode_tiled, encode_tile_size=encode_tile_size,
        encode_tile_overlap=encode_tile_overlap,
        decode_tiled=decode_tiled, decode_tile_size=decode_tile_size,
        decode_tile_overlap=decode_tile_overlap,
        compute_dtype=compute_dtype,
        attention_mode=attention_mode,
    )
    if dit_cache and vae_cache:
        cache.set_runner(runner_key, runner)
    return runner
