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
from .loader import convert_state_dict, sniff_dit_config, sniff_vae_config
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
            except (TypeError, ValueError, AttributeError):
                # AttributeError: newer safetensors map fp8 to the (absent)
                # np.float8_e4m3fn attribute instead of raising TypeError.
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
                        quant: str = "none",
                        on_host: bool = False) -> Tuple[dict, DiTConfig]:
    """Serving quantization modes (replaces the reference's GGUF/FP8 dequant
    machinery, src/optimization/gguf_dequant.py / compatibility.py):
      - quant="q8" (or keep_quantized=True): large linears stay int8 with
        Q8_0 block scales; matmuls run the fused dequant->bf16 MXU kernel
        (ops/quant_matmul.py). GGUF checkpoints keep their blocks verbatim;
        float checkpoints are post-training quantized.
      - quant="w8a8": per-channel int8 weights + per-token dynamic int8
        activations on the int8 MXU (ops/int8_matmul.py).
      - quant="q4k": GGUF K-quants (Q4_K/Q5_K) serve in their NATIVE affine
        layout via quant_matmul_affine (no requantization error; Q8_0
        tensors still use the q8 kernel). Non-GGUF checkpoints fall back
        to q8 post-training quantization.
      - quant="q4": post-training 4-bit affine quantization of ANY float
        checkpoint to the same serving layout as q4k (per-32-group
        scale/min, quant_matmul_affine) — halves q8's weight HBM at a
        measured whole-pipeline cost (~51 dB vs fp32 oracle,
        tests/test_pipeline_oracle.py floors).

    on_host=True leaves the param tree in host RAM (for the BlockSwap
    streaming path, ops/offload.py)."""
    if keep_quantized and quant == "none":
        quant = "q8"
    base_cfg = dit_config_for(os.path.basename(path))
    if path.endswith(".gguf"):
        from ..ops.gguf import load_gguf_state_dict

        state = load_gguf_state_dict(
            path, keep_q8=quant in ("q8", "q4k", "q4", "w8a8"),
            native_kquants=quant == "q4k")
    elif path.endswith((".pth", ".pt")):
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        raw = raw.get("state_dict", raw)
        state = {k: v.float().numpy() for k, v in raw.items()}
    else:
        state = _read_safetensors_numpy(path)
    cfg = sniff_dit_config(state, base_cfg)

    # Convert (and quantize) on the HOST: convert_state_dict places arrays
    # on the default (TPU) device, and round-tripping multi-GB trees through
    # the device for np-side work is slow. Ship to the accelerator in one
    # device_put at the end.
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        params = convert_state_dict(state, dtype=dtype)
        if quant == "w8a8":
            from ..ops.int8_matmul import quantize_dit_params_w8a8

            params = quantize_dit_params_w8a8(params)
        elif quant == "q4" and not path.endswith(".gguf"):
            from ..ops.quant_matmul import quantize_dit_params_affine4

            params = quantize_dit_params_affine4(params)
        elif quant in ("q8", "q4k") and not path.endswith(".gguf"):
            from ..ops.quant_matmul import quantize_dit_params

            params = quantize_dit_params(params)
        elif quant in ("q4", "q8", "q4k") and path.endswith(".gguf"):
            # GGUF checkpoints serve whatever quantization the file itself
            # carries (keep_q8/native_kquants above) — PTQ is not applied
            # on top. An F16 gguf therefore serves DENSE despite the flag.
            import warnings

            warnings.warn(
                f"--quant {quant} does not re-quantize GGUF checkpoints: "
                "the file's native format is served as-is (an F16 .gguf "
                "stays dense). Use a pre-quantized .gguf or a safetensors "
                "checkpoint for post-training quantization.",
                stacklevel=2)
    if not on_host:
        params = jax.device_put(params, jax.devices()[0])
    return params, cfg


def load_vae_checkpoint(path: str, dtype=COMPUTE_DTYPE):
    """Returns (params, VAEConfig) — config sniffed from tensor shapes."""
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
    # Sniff the architecture first (channel geometry reads the same off 2D
    # or 3D weights; temporal structure falls back to the published config
    # when 2D-stored), then inflate 2D-stored conv weights to the 3D causal
    # layout, matching the reference's InflatedCausalConv3d load hook
    # (causal_inflation_lib.py:440-495; "tail" is the published models'
    # mode). Inflation is a no-op for the published 5D checkpoints.
    from .loader import inflate_vae_2d_convs

    cfg = sniff_vae_config(fixed, VAE_V3)
    fixed = inflate_vae_2d_convs(fixed, cfg, mode="tail")
    return convert_state_dict(fixed, dtype=dtype), cfg


def _tree_bytes(tree) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree.leaves(tree))


# Per-chip HBM by device kind, used when the backend doesn't report a
# limit (the axon tunnel's memory_stats() is empty; real TPU VMs report
# bytes_limit). Matched case-insensitively against jax Device.device_kind.
_HBM_BY_DEVICE_KIND = (
    ("v5 lite", 15_500_000_000),   # v5e: 16 GB
    ("v5e", 15_500_000_000),
    ("v6 lite", 31_000_000_000),   # v6e (Trillium): 32 GB
    ("v6e", 31_000_000_000),
    ("v5p", 93_000_000_000),       # v5p: 95 GB
    ("v4", 31_000_000_000),        # v4: 32 GB
    ("v3", 31_000_000_000),        # v3: 32 GB
    ("v2", 15_000_000_000),        # v2: 16 GB
)
# conservative fallback when the kind is unrecognized too
_DEFAULT_HBM_BYTES = 15_500_000_000
# fraction of HBM the resident DiT weights may claim before host streaming
# auto-engages (the rest is activations, VAE weights, and XLA scratch)
_AUTO_SWAP_FRACTION = 0.70
# above this fraction, the resident DiT crowds out the VAE decoder's
# workspace at large tiles -> engage per-phase offload (the reference's
# manage_model_device policy, memory_manager.py:573-930): DiT leaves HBM
# during the VAE phases, restored at phase-2 entry
_PHASE_OFFLOAD_FRACTION = 0.30


def _hbm_bytes_limit() -> Optional[int]:
    import jax

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        return None  # CPU test platform: host RAM, no tiering needed
    try:
        stats = dev.memory_stats() or {}
    except Exception:  # noqa: BLE001
        stats = {}
    if stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    kind = (getattr(dev, "device_kind", "") or "").lower()
    for tag, nbytes in _HBM_BY_DEVICE_KIND:
        if tag in kind:
            return nbytes
    import warnings

    warnings.warn(
        f"memory_stats() reports no bytes_limit and device_kind "
        f"{kind!r} is unrecognized; assuming "
        f"{_DEFAULT_HBM_BYTES / 1e9:.1f} GB HBM for offload planning "
        "(set block_swap_config explicitly if this misclassifies "
        "your chip)", stacklevel=2)
    return _DEFAULT_HBM_BYTES


def _per_chip_dit_bytes(dit_params: dict, shard_ways: int) -> int:
    """Resident bytes per chip: the transformer blocks shard over the tp
    axis (their projections dominate; ada/norm are noise), the IO weights
    (patch in/out, time embedding) replicate."""
    total = _tree_bytes(dit_params)
    if shard_ways <= 1:
        return total
    blocks_bytes = sum(_tree_bytes(b) for b in dit_params["blocks"])
    return (total - blocks_bytes) + blocks_bytes // shard_ways


def _plan_block_streaming(dit_params: dict, dit_cfg: DiTConfig,
                          blocks_to_swap: int, debug: Debug,
                          shard_ways: int = 1):
    """Decide host-RAM weight tiering (the reference's BlockSwap,
    src/optimization/blockswap.py:88-456).

    Returns keep_blocks (blocks pinned in HBM) or None for no streaming.
    Explicit blocks_to_swap > 0 forces it; otherwise it auto-engages when
    the weights would crowd out activations (e.g. 7B fp16 = 16.4 GB >
    15.5 GB HBM). shard_ways: tensor parallelism — each chip holds only
    its tp slice, so the budget compares against per-chip bytes (7B over
    tp=2 fits HBM-resident without streaming)."""
    n = dit_cfg.num_layers
    if blocks_to_swap > 0:
        return max(0, n - min(blocks_to_swap, n))
    limit = _hbm_bytes_limit()
    if limit is None:
        return None
    per_chip = _per_chip_dit_bytes(dit_params, shard_ways)
    if per_chip <= _AUTO_SWAP_FRACTION * limit:
        return None
    # streaming does NOT compose with tp (StreamedNaDiT replicates its
    # blocks across the mesh — ops/offload.py attach_mesh), so once it
    # engages the keep plan must budget FULL, unsharded bytes
    blocks = dit_params["blocks"]
    block_bytes = _tree_bytes(blocks[0])
    io_bytes = _tree_bytes(dit_params) - sum(_tree_bytes(b) for b in blocks)
    resident_budget = _AUTO_SWAP_FRACTION * limit - io_bytes
    keep = int(max(0, min(n, resident_budget // max(block_bytes, 1))))
    debug.log(
        f"DiT weights {per_chip / 1e9:.1f} GB/chip exceed "
        f"{_AUTO_SWAP_FRACTION:.0%} of HBM ({limit / 1e9:.1f} GB); "
        f"auto-engaging host block streaming (keep {keep}/{n} blocks "
        "resident)", category="blockswap", force=True)
    return keep


def configure_runner(
    dit_model: str,
    vae_model: str,
    base_cache_dir: str = "./models",
    debug: Debug = NULL_DEBUG,
    dit_cache: bool = False,
    vae_cache: bool = False,
    block_swap_config: Optional[Dict[str, Any]] = None,
    encode_tiled: bool = False,
    # tile sizes: (px, px) or "auto" = memory-probed plan (utils/memplan)
    encode_tile_size=(1024, 1024),
    encode_tile_overlap: Tuple[int, int] = (128, 128),
    decode_tiled: bool = False,
    decode_tile_size=(1024, 1024),
    decode_tile_overlap: Tuple[int, int] = (128, 128),
    attention_mode: str = "flash",
    compute_dtype=COMPUTE_DTYPE,
    keep_quantized: bool = False,
    quant: str = "none",
    vae_quant: str = "none",
    tile_mode: str = "uniform",
    tensor_parallel: int = 1,
    **_compat_kwargs,
) -> VideoDiffusionRunner:
    """Build (or fetch cached) a fully configured runner for a model pair.

    The runner cache key covers EVERY knob that shapes the runner (the
    reference instead diffs stored configs and re-applies on mismatch,
    model_configuration.py:220-527 — with a total key a config change simply
    resolves to a different runner, while dit_cache/vae_cache still dedupe
    the expensive weight loads underneath)."""
    bs_cfg = dict(block_swap_config or {})
    blocks_to_swap = int(bs_cfg.get("blocks_to_swap", 0) or 0)
    cache = get_global_cache()
    runner_key = "|".join(map(str, (
        dit_model, vae_model, encode_tiled, encode_tile_size,
        encode_tile_overlap, decode_tiled, decode_tile_size,
        decode_tile_overlap, attention_mode, keep_quantized, quant,
        vae_quant, compute_dtype, blocks_to_swap, sorted(bs_cfg.items()),
        tile_mode, tensor_parallel)))
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

    dit_key = f"{dit_path}|{quant}|{keep_quantized}|{compute_dtype}"
    cached_dit = cache.get_dit(dit_key) if dit_cache else None
    if cached_dit is None:
        with debug.timer("load_dit", "DiT weights load"):
            # load to host RAM first; the streaming decision below needs the
            # true param size before anything lands in HBM
            host_params, dit_cfg = load_dit_checkpoint(
                dit_path, compute_dtype, keep_quantized=keep_quantized,
                quant=quant, on_host=True)
        if dit_cache:
            cache.set_dit(dit_key, (host_params, dit_cfg))
    else:
        host_params, dit_cfg = cached_dit

    # Tensor parallelism changes the memory plan: each chip will hold only
    # its tp slice of the blocks, so streaming/offload decisions compare
    # per-CHIP bytes (7B bf16 over tp=2 is HBM-resident — the lane the flag
    # exists for). The actual sharding happens at runner.attach_mesh.
    tp_eff = 1
    if tensor_parallel > 1:
        from ..parallel.tp import tp_compatible

        if tp_compatible(host_params, dit_cfg, tensor_parallel):
            tp_eff = tensor_parallel
        else:
            import warnings

            warnings.warn(
                f"tensor_parallel={tensor_parallel} requested but this "
                f"checkpoint's layout/dims do not shard that many ways; "
                f"planning memory single-chip", stacklevel=2)

    keep_blocks = _plan_block_streaming(host_params, dit_cfg, blocks_to_swap,
                                        debug, shard_ways=tp_eff)
    streamed_dit = None
    phase_offload = False
    if keep_blocks is not None:
        from ..ops.offload import StreamedNaDiT

        with debug.timer("stream_dit", "DiT resident blocks upload"):
            streamed_dit = StreamedNaDiT(host_params, dit_cfg,
                                         keep_blocks=keep_blocks)
        dit_params = None
    else:
        limit = _hbm_bytes_limit()
        phase_offload = (limit is not None
                         and _per_chip_dit_bytes(host_params, tp_eff)
                         > _PHASE_OFFLOAD_FRACTION * limit)
        if phase_offload:
            debug.log(
                "DiT weights large vs HBM: engaging per-phase offload "
                "(weights leave HBM during the VAE phases)",
                category="memory")
            dit_params = None  # uploaded lazily at phase-2 entry
        elif tp_eff > 1:
            # leave the tree on host: a replicated upload of a model that
            # only fits SHARDED would OOM chip 0 — attach_mesh does the
            # sharded upload (parallel/tp.py)
            dit_params = host_params
        else:
            with debug.timer("upload_dit", "DiT weights host->HBM"):
                dit_params = jax.device_put(host_params, jax.devices()[0])
                # force the transfer to complete inside the timer (transfers
                # are async; without this the first jit execution silently
                # absorbs multi-GB upload time)
                jax.block_until_ready(dit_params)

    # conv_quant and compute_dtype are baked into the constructed VideoVAE,
    # so the cache key must cover them — keying on path alone would hand a
    # runner that asked for bf16 a stale int8 VAE (or vice versa)
    vae_key = f"{vae_path}|{vae_quant}|{compute_dtype}"
    vae = cache.get_vae(vae_key) if vae_cache else None
    if vae is None:
        with debug.timer("load_vae", "VAE weights load"):
            vae_params, vae_cfg = load_vae_checkpoint(vae_path, compute_dtype)
            jax.block_until_ready(vae_params)
        if vae_quant != "none":
            from dataclasses import replace as _replace

            vae_cfg = _replace(vae_cfg, conv_quant=vae_quant)
        vae = VideoVAE(vae_params, vae_cfg, dtype=compute_dtype)
        if vae_cache:
            cache.set_vae(vae_key, vae)

    runner = VideoDiffusionRunner(
        dit_params, dit_cfg, vae, RunnerConfig(dit=dit_cfg, vae=vae.cfg),
        debug=debug,
        encode_tiled=encode_tiled, encode_tile_size=encode_tile_size,
        encode_tile_overlap=encode_tile_overlap,
        decode_tiled=decode_tiled, decode_tile_size=decode_tile_size,
        decode_tile_overlap=decode_tile_overlap,
        compute_dtype=compute_dtype,
        attention_mode=attention_mode,
        streamed_dit=streamed_dit,
        tile_mode=tile_mode,
    )
    if phase_offload:
        runner.set_phase_offload(host_params)
    if dit_cache and vae_cache:
        cache.set_runner(runner_key, runner)
    return runner
