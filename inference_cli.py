#!/usr/bin/env python
"""SeedVR2-TPU standalone CLI — video/image upscaling.

Surface-compatible with the reference inference_cli.py (same flags where they
make sense on TPU): input type detection (video/image/directory), chunked
streaming of arbitrarily long videos in bounded memory with temporal-overlap
blending, model caching across chunks, RGBA alpha, all color-correction
methods, and VAE tiling.

TPU-specific changes vs the reference:
 - --cuda_device / multi-GPU subprocess fan-out is replaced by sharded
   execution over the local TPU mesh (single SPMD process; see
   seedvr2_tpu/parallel). Frame-parallel chunk fan-out over mesh 'dp' comes
   from the same batch path.
 - --compile_* flags are accepted but no-ops: everything is jit-compiled.
 - --blocks_to_swap engages host-RAM block streaming (ops/offload.py); it
   also auto-engages when the DiT weights would not fit HBM (7B fp16).
"""

import argparse
import os
import sys
import time

import numpy as np

import _bootstrap  # noqa: F401

from seedvr2_tpu.core import pipeline
from seedvr2_tpu.core.model_manager import configure_runner
from seedvr2_tpu.utils import video_io
from seedvr2_tpu.utils.debug import Debug
from seedvr2_tpu.utils.model_registry import DEFAULT_DIT, DEFAULT_VAE
from seedvr2_tpu.utils.text_embeds import load_text_embeddings


def _tile_size(v: str):
    """Argparse type for tile-size flags: an int px side, or 'auto' for
    the memory-probed plan (seedvr2_tpu.utils.memplan)."""
    if v.strip().lower() == "auto":
        return "auto"
    return int(v)


def parse_arguments():
    p = argparse.ArgumentParser(
        description="SeedVR2 TPU video/image upscaler")
    io = p.add_argument_group("Input/Output")
    io.add_argument("input", type=str, nargs="?", default=None,
                    help="video, image, or directory")
    io.add_argument("--output", type=str, default=None)
    io.add_argument("--output_format", type=str, default=None,
                    choices=["mp4", "png", None])
    io.add_argument("--model_dir", type=str, default="./models")

    m = p.add_argument_group("Model selection")
    m.add_argument("--dit_model", type=str, default=DEFAULT_DIT)
    m.add_argument("--vae_model", type=str, default=DEFAULT_VAE)

    proc = p.add_argument_group("Processing")
    proc.add_argument("--resolution", type=int, default=1080)
    proc.add_argument("--max_resolution", type=int, default=0)
    proc.add_argument("--batch_size", type=int, default=5)
    proc.add_argument("--uniform_batch_size", action="store_true")
    proc.add_argument("--seed", type=int, default=42)
    proc.add_argument("--skip_first_frames", type=int, default=0)
    proc.add_argument("--load_cap", type=int, default=0)
    proc.add_argument("--chunk_size", type=int, default=0,
                      help="frames per streaming chunk (0 = whole video)")
    proc.add_argument("--prepend_frames", type=int, default=0)
    proc.add_argument("--temporal_overlap", type=int, default=0)

    q = p.add_argument_group("Quality")
    q.add_argument("--color_correction", type=str, default="lab",
                   choices=["lab", "wavelet", "wavelet_adaptive", "hsv",
                            "adain", "none"])
    q.add_argument("--input_noise_scale", type=float, default=0.0)
    q.add_argument("--latent_noise_scale", type=float, default=0.0)

    v = p.add_argument_group("VAE tiling")
    v.add_argument("--vae_encode_tiled", action="store_true")
    v.add_argument("--vae_encode_tile_size", type=_tile_size, default=1024,
                   help="tile side in px, or 'auto' to pick the largest "
                        "grid that fits HBM via compile-time memory probes")
    v.add_argument("--vae_encode_tile_overlap", type=int, default=128)
    v.add_argument("--vae_decode_tiled", action="store_true")
    v.add_argument("--vae_decode_tile_size", type=_tile_size, default=1024,
                   help="tile side in px, or 'auto' (see encode)")
    v.add_argument("--vae_decode_tile_overlap", type=int, default=128)
    v.add_argument("--tile_debug", type=str, default="false",
                   choices=["false", "encode", "decode"])
    v.add_argument("--tile_mode", type=str, default="uniform",
                   choices=["uniform", "ref"],
                   help="uniform = even same-shape tile grid (fastest); "
                        "ref = the reference's stride-sweep layout")

    perf = p.add_argument_group("Performance")
    perf.add_argument("--preset", type=str, default=None,
                      choices=["quality", "throughput"],
                      help="flag bundle (explicit flags win): 'quality' = "
                           "reference-parity defaults; 'throughput' = the "
                           "accuracy-gated TPU serving config behind the "
                           "bench headline (w8a8 DiT, tiled VAE with "
                           "1536 px encode / 1088 px decode tiles at "
                           "32/48 px overlap — gates: "
                           "w8a8 pipeline PSNR >= 69 dB vs the fp32 oracle, "
                           "tiled-vs-untiled seams unchanged vs the 128 px "
                           "default; tests/test_pipeline_oracle.py, "
                           "tests/test_vae_tiling.py)")
    perf.add_argument("--attention_mode", type=str, default="flash",
                      choices=["flash", "xla", "sdpa", "flash_attn"],
                      help="flash = Pallas kernel; xla/sdpa = XLA attention")
    perf.add_argument("--data_parallel", type=str, default="auto",
                      choices=["auto", "off"],
                      help="shard batches over all local TPU chips (replaces "
                           "the reference's --cuda_device fan-out)")
    perf.add_argument("--tensor_parallel", type=int, default=1,
                      help="shard the DiT's attention heads / mlp hidden "
                           "over this many chips (parallel/tp.py) — serves "
                           "7B HBM-resident on a v5e pod slice without "
                           "block streaming; composes with data parallel "
                           "(dp = local_devices / tensor_parallel)")
    perf.add_argument("--num_hosts", type=int, default=1,
                      help="multi-host (DCN) frame fan-out: run the same "
                           "command on every host with its --host_index, "
                           "then once with --join_parts (replaces the "
                           "reference's multi-GPU subprocess fan-out for "
                           "cross-host scale)")
    perf.add_argument("--host_index", type=int, default=None,
                      help="this host's index in [0, num_hosts); defaults "
                           "to jax.process_index()")
    perf.add_argument("--join_parts", action="store_true",
                      help="assemble the per-host .partN.npy segments into "
                           "the final output (Hann-blended seams, streamed "
                           "to the writer one segment at a time)")
    perf.add_argument("--coordinator_address", type=str, default=None,
                      help="host:port of host 0 for jax.distributed."
                           "initialize on real multi-host pods (also via "
                           "$JAX_COORDINATOR_ADDRESS); optional — the "
                           "file-based fan-out needs only a shared path")
    perf.add_argument("--quant", type=str, default="none",
                      choices=["none", "q8", "q4k", "q4", "w8a8"],
                      help="DiT serving quantization: q8 = int8 weights + "
                           "fused dequant matmul (GGUF checkpoints keep "
                           "their Q8_0 blocks); q4k = GGUF K-quants serve "
                           "in their native affine layout (no requant "
                           "error); q4 = post-training 4-bit affine "
                           "quantization of any float checkpoint (same "
                           "serving kernel as q4k, half of q8's weight "
                           "HBM); w8a8 = int8 weights AND per-token int8 "
                           "activations on the int8 MXU")
    perf.add_argument("--vae_quant", type=str, default="none",
                      choices=["none", "int8"],
                      help="EXPERIMENTAL. int8: VAE decoder 3x3x3 convs "
                           "run on the int8 MXU (shifted-matmul kernel). "
                           "Currently SLOWER end-to-end than bf16 (the "
                           "per-conv quantize passes outweigh the MXU "
                           "gain; docs/performance.md) - kept for kernel "
                           "development and accuracy evaluation")
    perf.add_argument("--compile_dit", action="store_true",
                      help="no-op (always jit-compiled)")
    perf.add_argument("--compile_vae", action="store_true",
                      help="no-op (always jit-compiled)")

    bs = p.add_argument_group("Memory")
    bs.add_argument("--blocks_to_swap", type=int, default=0,
                    help="stream the last N transformer blocks from host "
                         "RAM (auto-engages for larger-than-HBM models)")
    bs.add_argument("--swap_io_components", action="store_true",
                    help="accepted for API compat (IO params always stay "
                         "in HBM; they are <1%% of the model)")

    c = p.add_argument_group("Caching")
    c.add_argument("--cache_dit", action="store_true")
    c.add_argument("--cache_vae", action="store_true")

    pr = p.add_argument_group("Parity (BASELINE config #1 harness)")
    pr.add_argument("--parity_check", action="store_true",
                    help="after upscaling, score the output against a "
                         "reference capture (--parity_ref) and print a "
                         "one-line JSON PSNR report")
    pr.add_argument("--parity_ref", type=str, default=None,
                    help="reference output capture (.npy [T,H,W,C] in "
                         "[0,1], or an image file)")
    pr.add_argument("--parity_min_psnr", type=float, default=None,
                    help="exit non-zero if PSNR falls below this dB value")
    pr.add_argument("--convert_embeddings", nargs=2, default=None,
                    metavar=("SRC_DIR", "DST_DIR"),
                    help="convert pos_emb.pt/neg_emb.pt from SRC_DIR into "
                         "torch-free .npy files in DST_DIR, then exit")
    pr.add_argument("--allow_zero_embeddings", action="store_true",
                    help="benchmark-only: run a published-width model with "
                         "zero text embeddings if none resolve (default: "
                         "hard error — the packaged assets normally make "
                         "this unreachable)")

    d = p.add_argument_group("Debug")
    d.add_argument("--doctor", action="store_true",
                   help="print an environment health report (backend, "
                        "HBM, caches, model/asset resolution, native "
                        "extension) and exit; never hangs on a dead "
                        "TPU tunnel (exit 0 = backend computed, 3 = "
                        "unavailable)")
    d.add_argument("--device", type=str, default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="pin the jax platform (default: auto = whatever the "
                        "image provides; 'cpu' runs the whole pipeline "
                        "without acquiring the TPU — useful for debugging "
                        "and CI; replaces the reference's --cuda_device)")
    d.add_argument("--debug", action="store_true")
    d.add_argument("--profile_dir", type=str, default=None,
                   help="capture jax profiler traces per phase")
    args = p.parse_args()
    if args.preset == "throughput":
        # Apply the serving bundle only where the user left the default,
        # so explicit flags always win over the preset.
        # encode 1536-cap measured 4.71 s vs 5.11 at 1024 (4K, r4 capture);
        # decode keeps the 1088 cap — the aspect-aware planner turns it
        # into the measured-fastest (4,2) grid. Overlaps are the r5f
        # winners (tpu_session_r5f.jsonl): decode 48 px 11.02 s vs 13.63
        # at 64 px; encode 32 px 4.640 s vs 4.705 (seam-gated to 32 px
        # by tests/test_vae_tiling.py)
        bundle = dict(quant="w8a8", tile_mode="uniform",
                      vae_encode_tiled=True, vae_decode_tiled=True,
                      vae_encode_tile_size=1536, vae_decode_tile_size=1088,
                      vae_encode_tile_overlap=32, vae_decode_tile_overlap=48)
        for name, val in bundle.items():
            if getattr(args, name) == p.get_default(name):
                setattr(args, name, val)
    if args.resolution <= 0:
        p.error("--resolution must be positive")
    if args.max_resolution < 0:
        p.error("--max_resolution must be >= 0")
    if args.batch_size < 1:
        p.error("--batch_size must be >= 1")
    if args.chunk_size < 0 or args.temporal_overlap < 0:
        p.error("--chunk_size/--temporal_overlap must be >= 0")
    if args.chunk_size and args.temporal_overlap >= args.chunk_size:
        p.error("--temporal_overlap must be smaller than --chunk_size")
    if args.seed < 0:
        p.error("--seed must be >= 0")
    if args.tensor_parallel < 1:
        p.error("--tensor_parallel must be >= 1")
    # Flags accepted for reference API compatibility that have no effect
    # on TPU (everything is jit-compiled; IO params always stay in HBM,
    # reference blockswap.py:459-536): warn once when actually passed.
    noops = [f"--{n}" for n in
             ("compile_dit", "compile_vae", "swap_io_components")
             if getattr(args, n)]
    if noops:
        print(f"[seedvr2-tpu] note: {', '.join(noops)} accepted for API "
              "compatibility but a no-op on TPU (models are always "
              "jit-compiled; IO params always stay in HBM)",
              file=sys.stderr, flush=True)
    return args


def default_output_path(input_path: str, out_format: str) -> str:
    base, _ = os.path.splitext(input_path)
    suffix = time.strftime("_upscaled_%Y%m%d_%H%M%S")
    ext = ".mp4" if out_format == "mp4" else ".png"
    return base + suffix + ext


def build_mesh(args, n_devices: int):
    """Mesh the CLI's parallelism flags ask for, or None (single device).

    --tensor_parallel T shards the DiT over a 'tp' axis of extent T;
    --data_parallel auto spreads batches over the remaining chips
    (dp = n_devices // T). dp off + T > 1 uses only T chips."""
    tp = getattr(args, "tensor_parallel", 1)
    dp_auto = getattr(args, "data_parallel", "auto") == "auto"
    from seedvr2_tpu.parallel.mesh import make_mesh

    if tp > 1:
        if n_devices % tp:
            raise ValueError(
                f"--tensor_parallel {tp} does not divide the "
                f"{n_devices} local devices")
        dp = n_devices // tp if dp_auto else 1
        return make_mesh(dp * tp, axis_names=("dp", "tp"), shape=(dp, tp))
    if dp_auto and n_devices > 1:
        return make_mesh(n_devices, axis_names=("dp",))
    return None


def make_runner(args, debug):
    import jax

    # mesh FIRST (cheap, validates the flags), then configure: the memory
    # planner needs the tp extent to budget per-CHIP weight bytes (a 7B
    # that streams single-chip serves HBM-resident over tp=2)
    try:
        mesh = build_mesh(args, len(jax.local_devices()))
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        sys.exit(2)
    runner = _configure(args, debug,
                        tensor_parallel=(mesh.shape.get("tp", 1)
                                         if mesh is not None else 1))
    if mesh is not None:
        runner.attach_mesh(mesh)
        layout = " x ".join(f"{ax}={n}" for ax, n in mesh.shape.items())
        debug.log(f"multi-chip serving over {layout}",
                  category="setup", force=True)
    return runner


def _configure(args, debug, tensor_parallel: int = 1):
    return configure_runner(
        tensor_parallel=tensor_parallel,
        dit_model=args.dit_model, vae_model=args.vae_model,
        base_cache_dir=args.model_dir, debug=debug,
        dit_cache=args.cache_dit, vae_cache=args.cache_vae,
        block_swap_config={"blocks_to_swap": args.blocks_to_swap},
        encode_tiled=args.vae_encode_tiled,
        encode_tile_size=("auto" if args.vae_encode_tile_size == "auto"
                          else (args.vae_encode_tile_size,) * 2),
        encode_tile_overlap=(args.vae_encode_tile_overlap,) * 2,
        decode_tiled=args.vae_decode_tiled,
        decode_tile_size=("auto" if args.vae_decode_tile_size == "auto"
                          else (args.vae_decode_tile_size,) * 2),
        decode_tile_overlap=(args.vae_decode_tile_overlap,) * 2,
        attention_mode=args.attention_mode,
        quant=args.quant,
        vae_quant=args.vae_quant,
        tile_mode=args.tile_mode,
    )


def process_frames(runner, frames: np.ndarray, args, debug,
                   prepend_frames: int = 0) -> np.ndarray:
    """Run the 4 phases over one in-memory frame block (T, H, W, C) [0,1]."""
    if prepend_frames > 0:
        frames = pipeline.pad_video_temporal(frames, count=prepend_frames,
                                             prepend=True)
    ctx = pipeline.setup_generation_context(debug=debug,
                                            model_dir=args.model_dir,
                                            tile_debug=args.tile_debug)
    ctx["text_embeds"] = load_text_embeddings(
        [args.model_dir, os.path.dirname(os.path.abspath(__file__))], debug,
        txt_dim=runner.dit_cfg.txt_in_dim,
        allow_zero=args.allow_zero_embeddings)
    debug.checkpoint("pre_phase1")
    with debug.profile("phase1_encode"):
        ctx = pipeline.encode_all_batches(
            runner, ctx, frames, debug=debug, batch_size=args.batch_size,
            uniform_batch_size=args.uniform_batch_size, seed=args.seed,
            temporal_overlap=args.temporal_overlap,
            resolution=args.resolution, max_resolution=args.max_resolution,
            input_noise_scale=args.input_noise_scale,
            color_correction=args.color_correction)
    debug.checkpoint("post_phase1")
    with debug.profile("phase2_upscale"):
        ctx = pipeline.upscale_all_batches(
            runner, ctx, debug=debug, seed=args.seed,
            latent_noise_scale=args.latent_noise_scale)
    debug.checkpoint("post_phase2")
    with debug.profile("phase3_decode"):
        ctx = pipeline.decode_all_batches(runner, ctx, debug=debug)
    debug.checkpoint("post_phase3")
    with debug.profile("phase4_postprocess"):
        ctx = pipeline.postprocess_all_batches(
            ctx, debug=debug, color_correction=args.color_correction,
            prepend_frames=prepend_frames,
            temporal_overlap=args.temporal_overlap,
            batch_size=args.batch_size)
    debug.checkpoint("post_phase4")
    debug.summary(runner.streamed_dit.stats.summary()
                  if runner.streamed_dit is not None else None)
    return ctx["final_video"]


def process_video(args, debug):
    if args.num_hosts > 1:
        return _process_video_multihost(args, debug)
    reader = video_io.VideoReader(args.input, args.skip_first_frames,
                                  args.load_cap)
    out_format = args.output_format or "mp4"
    out_path = args.output or default_output_path(args.input, out_format)
    runner = make_runner(args, debug)
    png_base = os.path.splitext(out_path)[0] if out_format == "png" else None
    png_index = 0

    chunk = args.chunk_size if args.chunk_size > 0 else max(reader.remaining, 1)
    overlap = args.temporal_overlap
    writer = None
    held = None           # last `overlap` OUTPUT frames, not yet written
    prev_in_tail = None   # last `overlap` INPUT frames, re-fed to next chunk
    total_written = 0
    # --parity_check needs the assembled output; only retain it when asked
    # (streaming normally never holds the full video in RAM)
    parity_frames = [] if args.parity_check else None
    t_start = time.perf_counter()

    first_chunk = True
    while reader.remaining > 0:
        frames = reader.read_frames(chunk)
        if frames.shape[0] == 0:
            break
        debug.log(f"Processing chunk of {frames.shape[0]} frames "
                  f"({reader.remaining} remaining)", category="video",
                  force=True)
        if prev_in_tail is not None:
            frames = np.concatenate([prev_in_tail, frames], axis=0)
        result = process_frames(
            runner, frames, args, debug,
            prepend_frames=args.prepend_frames if first_chunk else 0)
        if held is not None:
            # seam: blend the held previous tail with this chunk's re-decoded
            # head (same source frames) — Hann crossfade, then write once
            result = result.copy()
            result[:overlap, :, :, :3] = pipeline.blend_overlapping_frames(
                held[:, :, :, :3], result[:overlap, :, :, :3], overlap)
        if writer is None and png_base is None:
            writer = video_io.VideoWriter(out_path, reader.fps,
                                          result.shape[1:3])

        def emit(frames_out):
            nonlocal total_written, png_index
            if png_base is not None:
                for frame in frames_out:
                    video_io.write_image(f"{png_base}_{png_index:06d}.png",
                                         frame)
                    png_index += 1
            else:
                writer.write_frames(frames_out)
            if parity_frames is not None:
                parity_frames.append(np.asarray(frames_out))
            total_written += frames_out.shape[0]

        if overlap > 0 and reader.remaining > 0 and result.shape[0] > overlap:
            emit(result[:-overlap])
            held = result[-overlap:]
            prev_in_tail = frames[-overlap:]
        else:
            emit(result)
            held = None
            prev_in_tail = None
        first_chunk = False
        # Per-chunk host-memory checkpoint: with --debug the RSS delta
        # between successive chunks makes the bounded-memory claim of
        # --chunk_size observable (a growing RSS across chunks = a leak;
        # reference tracks the same via psutil, memory_manager.py:166-208).
        debug.checkpoint(f"chunk_written[{total_written}]")

    if writer is not None:
        writer.close()
    reader.close()
    elapsed = time.perf_counter() - t_start
    fps = total_written / elapsed if elapsed > 0 else 0.0
    debug.log(f"Wrote {total_written} frames to {out_path} "
              f"({fps:.2f} frames/s end-to-end)", category="generation",
              force=True)
    if parity_frames:
        _parity_report(args, np.concatenate(parity_frames, axis=0))
    return out_path


def _parity_report(args, result):
    """--parity_check: score against the reference capture (BASELINE #1)."""
    if not args.parity_check:
        return
    from seedvr2_tpu.utils import parity

    if not args.parity_ref:
        parity.print_report({"parity": "no_capture",
                             "hint": "pass --parity_ref <capture.npy>"})
        return
    report = parity.compare_to_capture(result, args.parity_ref,
                                       args.parity_min_psnr)
    parity.print_report(report)
    if report.get("passed") is False:
        sys.exit(1)


def _process_video_multihost(args, debug):
    """Multi-host (DCN) frame fan-out: this host processes its frame range
    into a .npy segment; --join_parts assembles the segments (see
    seedvr2_tpu/parallel/multihost.py). The output path must be shared (or
    segments copied) for the join step."""
    from seedvr2_tpu.parallel import multihost

    out_path = args.output or default_output_path(args.input, "mp4")
    probe = video_io.VideoReader(args.input, args.skip_first_frames,
                                 args.load_cap)
    total, fps = probe.remaining, probe.fps
    probe.close()
    ranges = multihost.frame_ranges(total, args.num_hosts,
                                    args.temporal_overlap)

    if args.join_parts:
        # streamed join: at most one segment in RAM, chunks go straight to
        # the video writer (a long 4K video never assembles in memory)
        writer = None
        joined = 0
        for chunk in multihost.iter_joined_segments(
                out_path, args.num_hosts, args.temporal_overlap):
            if writer is None:
                writer = video_io.VideoWriter(out_path, fps, chunk.shape[1:3])
            writer.write_frames(chunk)
            joined += chunk.shape[0]
        if writer is not None:
            writer.close()
        debug.log(f"Joined {args.num_hosts} segments -> {out_path} "
                  f"({joined} frames)", category="generation",
                  force=True)
        return out_path

    idx = (args.host_index if args.host_index is not None
           else multihost.default_host_index())
    if not (0 <= idx < args.num_hosts):
        print(f"error: --host_index {idx} outside [0, {args.num_hosts})",
              file=sys.stderr)
        sys.exit(2)
    start, end = ranges[idx]
    debug.log(f"host {idx}/{args.num_hosts}: frames [{start}, {end}) of "
              f"{total}", category="setup", force=True)
    reader = video_io.VideoReader(args.input,
                                  args.skip_first_frames + start,
                                  end - start)
    runner = make_runner(args, debug)
    frames = reader.read_frames(end - start)
    reader.close()
    result = process_frames(
        runner, frames, args, debug,
        prepend_frames=args.prepend_frames if idx == 0 else 0)
    path = multihost.save_segment(out_path, idx, result)
    debug.log(f"host {idx}: wrote segment {path} ({result.shape[0]} "
              "frames)", category="generation", force=True)
    return path


def process_image(args, debug):
    frames = video_io.read_image(args.input)
    out_format = args.output_format or "png"
    out_path = args.output or default_output_path(args.input, out_format)
    runner = make_runner(args, debug)
    result = process_frames(runner, frames, args, debug)
    video_io.write_image(out_path, result[0])
    debug.log(f"Wrote {out_path}", category="generation", force=True)
    _parity_report(args, result)
    return out_path


def process_directory(args, debug):
    frames = video_io.read_directory(args.input)
    out_format = args.output_format or "mp4"
    out_path = args.output or default_output_path(
        os.path.join(args.input, "frames"), out_format)
    runner = make_runner(args, debug)
    result = process_frames(runner, frames, args, debug,
                            prepend_frames=args.prepend_frames)
    if out_format == "mp4":
        writer = video_io.VideoWriter(out_path, 30.0, result.shape[1:3])
        writer.write_frames(result)
        writer.close()
    else:
        base, _ = os.path.splitext(out_path)
        for i, frame in enumerate(result):
            video_io.write_image(f"{base}_{i:05d}.png", frame)
    debug.log(f"Wrote {out_path}", category="generation", force=True)
    _parity_report(args, result)
    return out_path


def main():
    args = parse_arguments()
    if args.device != "auto":
        from seedvr2_tpu.utils.backend import force_platform

        force_platform(args.device)
    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    coord = (args.coordinator_address
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if args.num_hosts > 1 and coord and not args.join_parts:
        # before first device use (jax.distributed requirement); makes
        # --host_index default to jax.process_index() fleet-wide
        from seedvr2_tpu.parallel import multihost

        multihost.distributed_init(coord, args.num_hosts, args.host_index)
    if args.doctor:
        from seedvr2_tpu.utils.doctor import run_doctor

        sys.exit(run_doctor(model_dir=args.model_dir))
    debug = Debug(enabled=args.debug, profile_dir=args.profile_dir)
    debug.log_environment()
    if args.convert_embeddings is not None:
        from seedvr2_tpu.utils import parity

        src, dst = args.convert_embeddings
        shapes = parity.convert_embeddings(src, dst)
        parity.print_report({"converted": {k: list(v)
                                           for k, v in shapes.items()},
                             "dst": dst})
        return
    if args.input is None:
        print("error: input is required", file=sys.stderr)
        sys.exit(2)
    try:
        kind = video_io.detect_input_type(args.input)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        sys.exit(2)
    if not os.path.exists(args.input):
        print(f"error: input not found: {args.input}", file=sys.stderr)
        sys.exit(2)
    if kind == "video":
        process_video(args, debug)
    elif kind == "image":
        process_image(args, debug)
    else:
        process_directory(args, debug)


if __name__ == "__main__":
    main()
