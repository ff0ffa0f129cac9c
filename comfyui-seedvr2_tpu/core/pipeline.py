"""4-phase generation pipeline: encode-all -> upscale-all -> decode-all ->
postprocess-all.

Reimplements src/core/generation_phases.py (1467 LoC of device-juggling) as a
lean host-side orchestrator: frames live in host numpy, batches are shipped to
HBM per phase, jitted per-shape functions do the compute, and the final video
is assembled into one preallocated host buffer with Hann-window temporal
overlap blending (generation_phases.py:960-990, generation_utils.py:284-312).

Batch index math matches the reference exactly:
 - step = batch_size - temporal_overlap (reset if <= 0),
 - uniform padding of the trailing batch (optional),
 - 4n+1 temporal padding with reversed frames (generation_utils.py:593-652),
 - per-batch `ori_length` trimming and spatial trim to true target dims,
 - prepend-frame removal at the end.
"""

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import color_fix, transforms
from ..utils.debug import NULL_DEBUG, Debug
from ..utils.partition import partition_by_size
from .runner import VideoDiffusionRunner


# ------------------------------------------------------------ temporal ops


def pad_video_temporal(video: np.ndarray, count: int = 0,
                       prepend: bool = False) -> np.ndarray:
    """Extend (T, H, W, C) video with reversed frames; count=0 means pad to
    the 4n+1 constraint (generation_utils.py:593-652)."""
    t = video.shape[0]
    if count == 0 and not prepend:
        if t % 4 == 1:
            return video
        count = ((t - 1) // 4 + 1) * 4 + 1 - t
    if count <= 0:
        return video
    if count >= t:
        repeat_count = count - t + 1
        last = video[-1:]
        repeated = np.repeat(last, repeat_count, axis=0)
        reversed_frames = video[1:][::-1] if t > 1 else video[:0]
        parts = ([repeated, reversed_frames, video] if prepend
                 else [video, reversed_frames, repeated])
        return np.concatenate(parts, axis=0)
    if prepend:
        reversed_frames = video[1:count + 1][::-1]
        return np.concatenate([reversed_frames, video], axis=0)
    reversed_frames = video[-count - 1:-1][::-1]
    return np.concatenate([video, reversed_frames], axis=0)


def blend_overlapping_frames(prev_tail: np.ndarray, cur_head: np.ndarray,
                             overlap: int) -> np.ndarray:
    """Hann crossfade for overlap >= 3, linear otherwise
    (generation_utils.py:284-312)."""
    if overlap >= 3:
        t = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
        u = np.clip((t - 1 / 3) / (1 / 3), 0.0, 1.0)
        w_prev = 0.5 + 0.5 * np.cos(np.pi * u)
    else:
        w_prev = np.linspace(1.0, 0.0, overlap, dtype=np.float32)
    w_prev = w_prev.reshape(overlap, 1, 1, 1)
    return prev_tail * w_prev + cur_head * (1.0 - w_prev)


def batch_indices(total_frames: int, batch_size: int, temporal_overlap: int):
    """Yield (start, end) per batch with overlap semantics
    (generation_phases.py:267-353)."""
    step = batch_size - temporal_overlap if temporal_overlap > 0 else batch_size
    if step <= 0:
        step = batch_size
        temporal_overlap = 0
    out = []
    for idx in range(0, total_frames, step):
        if idx == 0:
            start, end = 0, min(batch_size, total_frames)
        else:
            start, end = idx, min(idx + batch_size, total_frames)
            if end - start <= temporal_overlap:
                break
        out.append((start, end))
    return out, temporal_overlap


def calculate_optimal_batch_params(total_frames, batch_size, temporal_overlap):
    step = batch_size - temporal_overlap
    if step <= 0:
        step, temporal_overlap = batch_size, 0
    valid = [i for i in range(1, total_frames + 1) if i % 4 == 1]
    return {"step": step, "temporal_overlap": temporal_overlap,
            "best_batch": max(valid) if valid else 1}


# ------------------------------------------------------------------ phases


def setup_generation_context(debug: Debug = NULL_DEBUG,
                             interrupt_fn: Optional[Callable] = None,
                             **kwargs) -> Dict[str, Any]:
    return {
        "debug": debug,
        "interrupt_fn": interrupt_fn,
        "text_embeds": None,
        "all_latents": [],
        "all_upscaled_latents": [],
        "final_video": None,
        **kwargs,
    }


def _check_interrupt(ctx):
    fn = ctx.get("interrupt_fn")
    if fn is not None:
        fn()


def _transform_batch(ctx: Dict[str, Any], rgb: np.ndarray) -> jnp.ndarray:
    """Preprocess one padded batch: [0,1] THWC -> [-1,1] resized/padded."""
    return transforms.prepare_video(
        jnp.asarray(rgb), ctx["resolution"], ctx["max_resolution"])


def _prepare_batch(images: np.ndarray, start: int, end: int,
                   uniform_padding: int) -> np.ndarray:
    video = images[start:end]
    if uniform_padding > 0:
        video = pad_video_temporal(video, count=uniform_padding)
    return pad_video_temporal(video)  # 4n+1


def encode_all_batches(
    runner: VideoDiffusionRunner,
    ctx: Dict[str, Any],
    images: np.ndarray,
    debug: Debug = NULL_DEBUG,
    batch_size: int = 5,
    uniform_batch_size: bool = False,
    seed: int = 42,
    progress_callback=None,
    temporal_overlap: int = 0,
    resolution: int = 1080,
    max_resolution: int = 0,
    input_noise_scale: float = 0.0,
    color_correction: str = "wavelet",
) -> Dict[str, Any]:
    """Phase 1: VAE-encode all batches (generation_phases.py:171-535)."""
    debug.start_timer("phase1_encoding")
    runner.release_dit()  # VAE phase: HBM belongs to the encoder
    total = len(images)
    ctx.update(input_images=images, total_frames=total, resolution=resolution,
               max_resolution=max_resolution, seed=seed,
               color_correction=color_correction)
    ctx["is_rgba"] = images.shape[-1] == 4
    ctx["true_target_dims"] = transforms.compute_target_dims(
        images.shape[1], images.shape[2], resolution, max_resolution)

    batches, actual_overlap = batch_indices(total, batch_size, temporal_overlap)
    ctx["actual_temporal_overlap"] = actual_overlap
    ctx["batch_size"] = batch_size
    ctx["all_latents"] = []
    ctx["all_ori_lengths"] = []
    ctx["batch_metadata"] = []
    if ctx["is_rgba"]:
        ctx["all_alpha_channels"] = []
        ctx["all_input_rgb"] = []

    key = jax.random.PRNGKey(seed + 1_000_000)  # VAE key discipline

    # dp-sized waves: same-shape batches VAE-encode as ONE sharded call over
    # the mesh 'dp' axis (temporal parallelism — batches are causally
    # independent by the 4n+1 padding design; runner._batched_waves)
    dp = (runner.mesh.shape.get("dp", 1)
          if runner.mesh is not None and not runner.encode_tiled else 1)
    chunk = max(dp, 1)
    ctx["all_latents"] = [None] * len(batches)
    for wave in partition_by_size(range(len(batches)), chunk):
        transformed_wave = []
        for bi in wave:
            _check_interrupt(ctx)
            start, end = batches[bi]
            ori_length = end - start
            uniform_pad = (batch_size - ori_length
                           if uniform_batch_size and ori_length < batch_size
                           else 0)
            video = _prepare_batch(images, start, end, uniform_pad)
            ctx["all_ori_lengths"].append(ori_length)
            ctx["batch_metadata"].append((start, end, uniform_pad))

            if ctx["is_rgba"]:
                ctx["all_alpha_channels"].append(video[..., 3:4].copy())
                ctx["all_input_rgb"].append(video[..., :3].copy())
                rgb = video[..., :3]
            else:
                rgb = video

            debug.start_timer(f"transform_{bi}")
            transformed = _transform_batch(ctx, rgb)
            if debug.enabled:
                jax.block_until_ready(transformed)
            debug.end_timer(f"transform_{bi}", f"transform batch {bi}")
            if input_noise_scale > 0:
                nkey = jax.random.fold_in(key, bi)
                noise = jax.random.normal(nkey, transformed.shape,
                                          transformed.dtype) * 0.05
                blend = input_noise_scale * 0.5
                transformed = (transformed * (1 - blend)
                               + (transformed + noise) * blend)
            transformed_wave.append(transformed.astype(runner.compute_dtype))

        debug.start_timer(f"vae_encode_{wave[0]}")
        latents = runner.vae_encode(transformed_wave)
        for bi, latent in zip(wave, latents):
            ctx["all_latents"][bi] = jax.device_get(latent)
        debug.end_timer(f"vae_encode_{wave[0]}",
                        f"vae encode batches {wave[0]}-{wave[-1]}")
        ctx["encode_tile_boundaries"] = list(
            getattr(runner.vae, "last_encode_tiles", []))
        if progress_callback:
            progress_callback(wave[-1] + 1, len(batches),
                              sum(e - s for s, e in
                                  (batches[i] for i in wave)),
                              "Phase 1: Encoding")
    debug.end_timer("phase1_encoding", "Phase 1: VAE encoding complete")
    return ctx


def upscale_all_batches(
    runner: VideoDiffusionRunner,
    ctx: Dict[str, Any],
    debug: Debug = NULL_DEBUG,
    progress_callback=None,
    seed: int = 42,
    latent_noise_scale: float = 0.0,
    cache_model: bool = False,
    noise_override: Optional[list] = None,
) -> Dict[str, Any]:
    """Phase 2: one-step DiT upscaling (generation_phases.py:538-799).

    cfg scale is forced to 1.0 and steps to 1 for the distilled model.
    noise_override: optional per-batch noise arrays replacing the seeded
    jax.random draw — used by the whole-pipeline oracle test to feed the
    reference pipeline's torch RNG noise so outputs are comparable (the
    two RNG disciplines differ by design)."""
    debug.start_timer("phase2_upscaling")
    if ctx.get("text_embeds") is None:
        from ..utils.text_embeds import load_text_embeddings

        ctx["text_embeds"] = load_text_embeddings(
            [ctx.get("model_dir"), "."], debug,
            txt_dim=runner.dit_cfg.txt_in_dim)

    n = len(ctx["all_latents"])
    noises, conds = [], []
    for bi, latent in enumerate(ctx["all_latents"]):
        latent = jnp.asarray(latent, dtype=runner.compute_dtype)
        # identical RNG per batch: same seed -> same noise (phase2 :659)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        if noise_override is not None:
            base_noise = jnp.asarray(noise_override[bi], jnp.float32)
        else:
            base_noise = jax.random.normal(k1, latent.shape, jnp.float32)
        if latent_noise_scale > 0:
            aug = base_noise * 0.1 + jax.random.normal(
                k2, latent.shape, jnp.float32) * 0.05
            t = jnp.asarray([1000.0 * latent_noise_scale])
            shape = jnp.asarray([latent.shape[:-1]])[..., :3]
            t = runner.timestep_transform(t, shape)
            blurred = runner.schedule.forward(
                latent.astype(jnp.float32), aug, t[0])
        else:
            blurred = latent
        noise = base_noise.astype(runner.compute_dtype)
        conds.append(runner.get_condition(
            noise, blurred.astype(runner.compute_dtype)))
        noises.append(noise)
        ctx["all_latents"][bi] = None

    # Real DiT-phase data parallelism (replaces the reference's per-GPU
    # frame-range fan-out, inference_cli.py:1048-1214): same-shape temporal
    # batches are stacked into ONE sharded inference call per dp-sized chunk
    # so b=dp shards over the mesh 'dp' axis; the tail chunk is padded by
    # replicating its last batch and the padding is dropped after.
    dp = runner.mesh.shape.get("dp", 1) if runner.mesh is not None else 1
    chunk = max(dp, 1)
    groups: Dict[tuple, list] = {}
    for i, x in enumerate(noises):
        groups.setdefault(x.shape, []).append(i)
    results: list = [None] * n
    done = 0
    for idxs in groups.values():
        for call_idx in partition_by_size(idxs, chunk):
            _check_interrupt(ctx)
            real = len(call_idx)
            pad = (-real) % chunk
            call_idx = call_idx + [call_idx[-1]] * pad
            outs = runner.inference(
                noises=[noises[i] for i in call_idx],
                conditions=[conds[i] for i in call_idx],
                texts_pos=[ctx["text_embeds"]["pos"]],
                texts_neg=[ctx["text_embeds"]["neg"]],
                cfg_scale=1.0, steps=1,
            )
            for j in range(real):
                results[call_idx[j]] = jax.device_get(outs[j])
            done += real
            if progress_callback:
                progress_callback(done, n, real, "Phase 2: Upscaling")
    ctx["all_upscaled_latents"] = results
    ctx["all_latents"] = []
    if runner.streamed_dit is not None:
        s = runner.streamed_dit.stats.summary()
        if s.get("total_swaps"):
            debug.log(
                f"BlockSwap: {s['block_swaps']} swaps, stall "
                f"avg {s['block_avg_ms']:.1f} ms / max "
                f"{s['block_max_ms']:.1f} ms (one un-prefetched transfer = "
                f"{s['measured_transfer_ms']:.1f} ms, "
                f"{s['block_bytes'] / 1e6:.0f} MB/block)",
                category="blockswap", force=True)
    debug.end_timer("phase2_upscaling", "Phase 2: DiT upscaling complete")
    return ctx


def decode_all_batches(
    runner: VideoDiffusionRunner,
    ctx: Dict[str, Any],
    debug: Debug = NULL_DEBUG,
    progress_callback=None,
    cache_model: bool = False,
) -> Dict[str, Any]:
    """Phase 3: VAE decode into a preallocated host buffer with in-place
    overlap blending (generation_phases.py:802-1046)."""
    debug.start_timer("phase3_decoding")
    runner.release_dit()  # VAE phase: HBM belongs to the decoder
    true_h, true_w = ctx["true_target_dims"]
    total = ctx["total_frames"]
    channels = 4 if ctx.get("is_rgba") else 3
    final = np.zeros((total, true_h, true_w, channels), dtype=np.float32)
    overlap = ctx.get("actual_temporal_overlap", 0)

    write_idx = 0
    ctx["decode_batch_info"] = []
    n = len(ctx["all_upscaled_latents"])
    # dp-sized waves: decode same-shape batches as one sharded call
    # (temporal parallelism over the mesh; runner._batched_waves), then
    # blend sequentially in batch order into the preallocated buffer
    dp = (runner.mesh.shape.get("dp", 1)
          if runner.mesh is not None and not runner.decode_tiled else 1)
    chunk = max(dp, 1)
    for wave in partition_by_size(range(n), chunk):
        _check_interrupt(ctx)
        samples = runner.vae_decode(
            [jnp.asarray(ctx["all_upscaled_latents"][bi]) for bi in wave])
        for bi, sample in zip(wave, samples):
            sample = np.asarray(jax.device_get(sample), dtype=np.float32)
            ori = ctx["all_ori_lengths"][bi]
            sample = sample[:ori, :true_h, :true_w]

            if bi > 0 and overlap > 0 and overlap < sample.shape[0] \
                    and write_idx >= overlap:
                prev_tail = final[write_idx - overlap: write_idx, :, :, :3]
                blended = blend_overlapping_frames(prev_tail,
                                                   sample[:overlap], overlap)
                final[write_idx - overlap: write_idx, :, :, :3] = blended
                sample = sample[overlap:]

            end = write_idx + sample.shape[0]
            final[write_idx:end, :, :, :3] = sample
            ctx["decode_batch_info"].append((write_idx, end, bi, ori))
            write_idx = end
            ctx["all_upscaled_latents"][bi] = None
        if progress_callback:
            progress_callback(wave[-1] + 1, n, len(wave),
                              "Phase 3: Decoding")

    ctx["final_video"] = final[:write_idx]
    ctx["all_upscaled_latents"] = []
    ctx["decode_tile_boundaries"] = list(
        getattr(runner.vae, "last_decode_tiles", []))
    debug.end_timer("phase3_decoding", "Phase 3: VAE decoding complete")
    return ctx


def postprocess_all_batches(
    ctx: Dict[str, Any],
    debug: Debug = NULL_DEBUG,
    progress_callback=None,
    color_correction: str = "wavelet",
    prepend_frames: int = 0,
    temporal_overlap: int = 0,
    batch_size: int = 5,
) -> Dict[str, Any]:
    """Phase 4: color correction vs the reconstructed transformed input,
    alpha merge, [-1,1] -> [0,1] (generation_phases.py:1049-1467)."""
    debug.start_timer("phase4_postprocessing")
    final = ctx["final_video"]
    true_h, true_w = ctx["true_target_dims"]
    overlap = ctx.get("actual_temporal_overlap", 0)
    info = ctx["decode_batch_info"]

    # alpha: edge-guided upscale written into channel 3
    if ctx.get("is_rgba") and ctx.get("all_alpha_channels"):
        from .alpha import process_alpha_for_batch

        for (ws, we, bi, ori) in info:
            alpha = ctx["all_alpha_channels"][bi]
            rgb_orig = ctx["all_input_rgb"][bi]
            rgb_up = final[ws:we, :, :, :3]
            a_up = process_alpha_for_batch(rgb_up, alpha, rgb_orig)
            final[ws:we, :, :, 3:4] = a_up[: we - ws]

    for step, (ws, we, bi, ori) in enumerate(info):
        _check_interrupt(ctx)
        sample = final[ws:we, :, :, :3]  # [-1, 1]
        if color_correction != "none":
            start, end, uniform_pad = ctx["batch_metadata"][bi]
            ref = _prepare_batch(ctx["input_images"], start, end, uniform_pad)
            ref = ref[..., :3] if ref.shape[-1] == 4 else ref
            ref = np.asarray(jax.device_get(_transform_batch(ctx, ref)),
                             dtype=np.float32)
            if bi > 0 and overlap > 0:
                ref = ref[overlap:]
            ref = ref[: sample.shape[0], :true_h, :true_w]
            corrected = color_fix.apply_color_correction(
                color_correction, jnp.asarray(sample), jnp.asarray(ref))
            sample = np.asarray(jax.device_get(corrected), dtype=np.float32)
        final[ws:we, :, :, :3] = np.clip(sample, -1.0, 1.0) * 0.5 + 0.5
        if progress_callback:
            progress_callback(step + 1, len(info), 1, "Phase 4: Post-processing")

    # tile_debug overlay: draw the last tiled encode/decode boundaries
    tile_debug = ctx.get("tile_debug", "false")
    if tile_debug in ("encode", "decode"):
        tiles = ctx.get(f"{tile_debug}_tile_boundaries") or []
        color = np.array([1.0, 0.2, 0.2] if tile_debug == "decode"
                         else [0.2, 1.0, 0.2], np.float32)
        for (y, x, h, w) in tiles:
            y2 = min(y + h, final.shape[1]) - 1
            x2 = min(x + w, final.shape[2]) - 1
            final[:, y:y2 + 1, [x, x2], :3] = color
            final[:, [y, y2], x:x2 + 1, :3] = color

    if prepend_frames > 0 and prepend_frames < final.shape[0]:
        final = final[prepend_frames:]
    ctx["final_video"] = final
    debug.end_timer("phase4_postprocessing", "Phase 4: Post-processing complete")
    return ctx
