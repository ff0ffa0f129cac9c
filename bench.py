"""Benchmark: SeedVR2-3B END-TO-END upscale throughput, 720p->4K, one chip.

Measures the full compute chain of the pipeline on real hardware (the
north-star metric is end-to-end frames/s/chip; the VAE at 4K dominates
wall time, reference README.md:940):

  encode : VAE encode of the 4K-resized input (5 frames, uniform tile grid)
  dit    : one-step 3B NaDiT denoise at 4K latent (2x270x480, bf16,
           windowed Pallas flash attention)
  decode : tiled VAE decode to 4K (uniform tile grid)
plus optional lanes (budget permitting):
  dit_w8a8 : the int8 serving mode (--quant w8a8)
  dit_7b_q8: the 7B denoiser in q8 serving mode (BASELINE names 3B AND 7B)

Weights are random (zero-egress env); shapes/arithmetic are exactly the
real model's. Inputs are re-randomized every iteration (the axon dev
client memoizes repeated executions) and every iteration ends with a
4-byte scalar fetch — the only reliable execution barrier through the
dev tunnel (block_until_ready can return before the remote finishes).

TIME-BUDGET DESIGN (the round-2 bench timed out and yielded nothing):
 - ONE process. The axon dev tunnel serializes client sessions and takes
   0.5-10 min to reap a dead one, so every extra subprocess risks paying
   a multi-minute session-acquisition stall (measured: a trivial
   first-fetch blocked 25 s / 180 s / 549 s depending on how the previous
   process exited). All phases run in-process; between phases every live
   jax.Array is explicitly deleted — .delete() verifiably frees
   server-side HBM (12 GB allocated after freeing 10 GB on a 16 GB chip),
   unlike garbage collection, whose free RPCs the dev client defers.
 - A cumulative JSON result line is printed after EVERY phase, so the
   last stdout line is always parseable even if the driver's timeout
   lands mid-phase ("partial": true until encode+dit+decode are all in).
 - BENCH_BUDGET_S (default 1500 s) degrades the plan: iterations drop to
   1 and the optional lanes are skipped when the remaining budget is thin.
 - The persistent XLA compile cache is enabled; repeat runs skip client
   compiles.

Prints ONE final JSON line {"metric", "value", "unit", "vs_baseline",
...extras}. vs_baseline compares against an ANALYTICAL A100 end-to-end
estimate (the reference publishes no absolute numbers — BASELINE.md):
  A100 312 bf16 TFLOP/s at 40% MFU = 125 TF/s effective, on
  encode ~396 TF (4K, 5 frames) + DiT ~350 TF + decode ~1023 TF exact
  coverage x1.71 stride-sweep tile waste (reference tiling) = 1749 TF
  => (396 + 350 + 1749) / 125 = 20.0 s per 5 frames => 0.25 frames/s.
The DiT-only number and its A100 baseline (1.5 f/s, same method) are kept
as extra fields for continuity with BENCH_r01.
"""

import gc
import json
import os
import signal
import sys
import time

import _bootstrap  # noqa: F401

A100_E2E_BASELINE_FPS = 0.25   # analytical, see module docstring
A100_DIT_BASELINE_FPS = 1.5    # analytical (BENCH_r01 continuity)
A100_DIT_7B_BASELINE_FPS = 0.75  # analytical: 7B ~2x the 3B step FLOPs
FRAMES = 5

_T0 = time.perf_counter()


def _elapsed():
    return time.perf_counter() - _T0


def _budget():
    return float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _note(msg):
    print(f"[bench] {msg} (t={_elapsed():.0f}s)", file=sys.stderr, flush=True)


def _shapes(on_tpu: bool):
    if on_tpu:
        from seedvr2_tpu.core.configs import DIT_3B, DIT_7B, VAE_V3

        # Serving tile overlaps are the r5f-measured winners
        # (tpu_session_r5f.jsonl, one session, median of 3 each):
        # decode 48 px -> (4,2) of 72x243 latent, 11.02 s vs 13.63 s for
        # the 64 px anchor (non-overlapping spreads; 71x242 @32 px and
        # 38x480 strips were both slower); encode 32 px -> (2,2) of
        # 137x242, 4.640 s vs 4.705 @64. Seam accuracy is gated down to
        # 32 px by tests/test_vae_tiling.py. Caps are the r4-measured
        # winners (tpu_session_r4.jsonl): encode 1536 (4.71 s vs 5.11 at
        # 1024); decode 1088 + the aspect-aware planner (11.47 s vs
        # 15.22 for the area-cost (2,4) and 12.36 for the r3 128 px).
        return dict(dit_cfg=DIT_3B, dit7b_cfg=DIT_7B, vae_cfg=VAE_V3,
                    in_h=2160, in_w=3840, lt=2, lh=270, lw=480, txt_len=58,
                    iters=2, enc_tile=(1536, 1536), dec_tile=(1088, 1088),
                    enc_ov=(32, 32), dec_ov=(48, 48))
    from seedvr2_tpu.core.configs import VAEConfig, small_test_config

    return dict(dit_cfg=small_test_config(), dit7b_cfg=small_test_config(),
                vae_cfg=VAEConfig(block_out_channels=(8, 8, 16, 16),
                                  layers_per_block=1, latent_channels=16,
                                  norm_num_groups=4),
                in_h=64, in_w=64, lt=2, lh=8, lw=8, txt_len=8,
                iters=1, enc_tile=(48, 48), dec_tile=(48, 48),
                enc_ov=(16, 16), dec_ov=(16, 16))


def _force(x):
    """Fetch a 4-byte scalar: the only reliable execution barrier through
    the axon dev client (block_until_ready can return before the remote
    execution completes; see docs/performance.md env caveats)."""
    import jax.numpy as jnp

    return float(jnp.mean(x.astype(jnp.float32)))


def _timed(fn, iters):
    fn(0)  # compile
    start = time.perf_counter()
    for i in range(iters):
        fn(i + 1)
    return (time.perf_counter() - start) / iters


def _delete_tree(*trees):
    """Explicitly free the device buffers of param trees. GC-driven frees
    are deferred by the axon dev client (which is what produced the
    spurious RESOURCE_EXHAUSTED in round-2 multi-phase single-process
    runs); Array.delete() verifiably releases server-side HBM."""
    import jax

    n = 0
    for tree in trees:
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "delete"):
                try:
                    leaf.delete()
                    n += 1
                except Exception:  # noqa: BLE001 (donated/already deleted)
                    pass
    return n


def _sweep():
    """Free anything the phases missed: gc, then delete every still-live
    device array (phases share nothing across the sweep)."""
    import jax

    gc.collect()
    n = 0
    for a in jax.live_arrays():
        try:
            a.delete()
            n += 1
        except Exception:  # noqa: BLE001  (already donated/deleted)
            pass
    _note(f"swept {n} device buffers")


def _iters(p):
    """Iteration count under the remaining budget."""
    if _elapsed() > 0.6 * _budget():
        return 1
    return p["iters"]


def phase_encode(p):
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(jax.random.fold_in(key, 9), p["vae_cfg"],
                                   dtype=jnp.bfloat16), p["vae_cfg"])
    runner = VideoDiffusionRunner(
        None, p["dit_cfg"], vae=vae,
        config=RunnerConfig(dit=p["dit_cfg"], vae=p["vae_cfg"]),
        encode_tiled=True, encode_tile_size=p["enc_tile"],
        encode_tile_overlap=p["enc_ov"], tile_mode="uniform")

    def run(i):
        video = jax.random.uniform(
            jax.random.fold_in(key, 1000 + i),
            (FRAMES, p["in_h"], p["in_w"], 3), jnp.bfloat16, -1.0, 1.0)
        _force(runner.vae_encode([video])[0])

    try:
        return _timed(run, _iters(p))
    finally:
        _delete_tree(vae.params)


def _init_quantized_by_block(key, cfg, quantize):
    """Random-init a quantized DiT tree one block at a time, so the full
    bf16 tree never exists on device (7B bf16 = 16.5 GB > HBM; the q8
    tree is ~8 GB). Valid for structurally-uniform block stacks (7B:
    block_shared/block_vid_only are layer-independent)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.models.dit.nadit import init_dit_params

    if cfg.family == "dit_3b":
        # 3B stacks are NOT uniform: blocks < mm_layers carry separate
        # vid/txt weights and the last block is vid-only, so a
        # num_layers=1 template would build the wrong tree.
        raise ValueError("by-block init requires a structurally-uniform "
                         "block stack (dit_7b); dit_3b blocks vary by index")
    cfg1 = dataclasses.replace(cfg, num_layers=1)
    params = quantize(init_dit_params(key, cfg1, dtype=jnp.bfloat16))
    blocks = params["blocks"]
    for i in range(1, cfg.num_layers):
        raw = init_dit_params(jax.random.fold_in(key, i), cfg1,
                              dtype=jnp.bfloat16)
        qblk = quantize({"blocks": raw["blocks"]})["blocks"][0]
        # free the bf16 originals (quantization passes small leaves
        # through unchanged — keep anything qblk still references)
        keep = {id(leaf) for leaf in jax.tree.leaves(qblk)}
        for leaf in jax.tree.leaves(raw):
            if id(leaf) not in keep and hasattr(leaf, "delete"):
                leaf.delete()
        blocks.append(qblk)
    params["blocks"] = blocks
    return params


def _dit_phase(p, cfg, quant):
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params

    key = jax.random.PRNGKey(0)
    if quant == "w8a8" and cfg.family == "dit_7b":
        # 7B: the bf16 tree (16.5 GB) never fits HBM whole — init+quantize
        # block-by-block like the q8 lane
        from seedvr2_tpu.ops.int8_matmul import quantize_dit_params_w8a8

        params = _init_quantized_by_block(key, cfg, quantize_dit_params_w8a8)
    elif quant == "w8a8":
        from seedvr2_tpu.ops.int8_matmul import quantize_dit_params_w8a8

        params = quantize_dit_params_w8a8(
            init_dit_params(key, cfg, dtype=jnp.bfloat16))
    elif quant == "q8":
        from seedvr2_tpu.ops.quant_matmul import quantize_dit_params

        params = _init_quantized_by_block(key, cfg, quantize_dit_params)
    else:
        params = init_dit_params(key, cfg, dtype=jnp.bfloat16)
    runner = VideoDiffusionRunner(params, cfg, vae=None,
                                  config=RunnerConfig(dit=cfg))
    txt = jax.random.normal(jax.random.fold_in(key, 3),
                            (p["txt_len"], cfg.txt_in_dim), jnp.bfloat16)

    def run(i):
        noise = jax.random.normal(
            jax.random.fold_in(key, 2000 + i),
            (p["lt"], p["lh"], p["lw"], cfg.vid_out_channels), jnp.bfloat16)
        blur = jax.random.normal(jax.random.fold_in(key, 3000 + i),
                                 noise.shape, jnp.bfloat16)
        cond = runner.get_condition(noise, blur)
        _force(runner.inference(
            noises=[noise], conditions=[cond], texts_pos=[txt],
            texts_neg=[txt], cfg_scale=1.0, steps=1)[0])

    try:
        return _timed(run, _iters(p))
    finally:
        _delete_tree(params, txt)


def phase_dit(p):
    return _dit_phase(p, p["dit_cfg"], "none")


def phase_dit_w8a8(p):
    return _dit_phase(p, p["dit_cfg"], "w8a8")


def phase_dit_7b_q8(p):
    return _dit_phase(p, p["dit7b_cfg"], "q8")


def phase_dit_7b_w8a8(p):
    """7B on the int8 MXU (~2x the q8 lane's matmul rate; not in the
    default lane list — run via BENCH_LANES=dit_7b_w8a8)."""
    return _dit_phase(p, p["dit7b_cfg"], "w8a8")


def phase_decode(p):
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    key = jax.random.PRNGKey(0)
    vae = VideoVAE(init_vae_params(jax.random.fold_in(key, 9), p["vae_cfg"],
                                   dtype=jnp.bfloat16), p["vae_cfg"])
    runner = VideoDiffusionRunner(
        None, p["dit_cfg"], vae=vae,
        config=RunnerConfig(dit=p["dit_cfg"], vae=p["vae_cfg"]),
        decode_tiled=True, decode_tile_size=p["dec_tile"],
        decode_tile_overlap=p["dec_ov"], tile_mode="uniform")
    lat_c = p["vae_cfg"].latent_channels

    def run(i):
        lat = jax.random.normal(jax.random.fold_in(key, 4000 + i),
                                (p["lt"], p["lh"], p["lw"], lat_c),
                                jnp.bfloat16)
        _force(runner.vae_decode([lat])[0])

    try:
        return _timed(run, _iters(p))
    finally:
        _delete_tree(vae.params)


def phase_dp_scaling(p):
    """Multi-chip data-parallel scaling (BASELINE configs[4]): per-item
    VAE decode waves and DiT batch inference, sequential vs dp-sharded
    over all devices. Runs only when >1 device is visible — the runnable
    artifact behind the "~linear to N chips" claim the day multi-chip
    hardware exists (on one chip it reports skipped=True cleanly). Host-
    side wave-orchestration overhead is measured separately on the 8-dev
    CPU mesh (tools/wave_overhead.py, docs/performance.md)."""
    import jax
    import jax.numpy as jnp

    n = len(jax.devices())
    if n < 2:
        _note("dp_scaling: skipped (single device)")
        return None

    from seedvr2_tpu.core.configs import RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params
    from seedvr2_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n, axis_names=("dp",))
    key = jax.random.PRNGKey(0)
    cfg = p["dit_cfg"]
    lat_c = p["vae_cfg"].latent_channels
    # per-item shapes sized so an UNTILED decode fits one chip (each dp
    # rank owns whole items; tiling is the orthogonal, single-item axis)
    lh, lw = max(p["lh"] // 4, 2), max(p["lw"] // 4, 2)
    dh, dw = max(p["lh"] // 2, 2), max(p["lw"] // 2, 2)

    vae = VideoVAE(init_vae_params(jax.random.fold_in(key, 9), p["vae_cfg"],
                                   dtype=jnp.bfloat16), p["vae_cfg"])
    params = init_dit_params(key, cfg, dtype=jnp.bfloat16)
    txt = jax.random.normal(jax.random.fold_in(key, 3),
                            (p["txt_len"], cfg.txt_in_dim), jnp.bfloat16)

    def runners():
        seq = VideoDiffusionRunner(params, cfg, vae=vae,
                                   config=RunnerConfig(dit=cfg,
                                                       vae=p["vae_cfg"]))
        par = VideoDiffusionRunner(params, cfg, vae=vae,
                                   config=RunnerConfig(dit=cfg,
                                                       vae=p["vae_cfg"]))
        par.attach_mesh(mesh)
        return seq, par

    seq, par = runners()
    lats = [jax.random.normal(jax.random.fold_in(key, 100 + i),
                              (p["lt"], lh, lw, lat_c), jnp.bfloat16)
            for i in range(n)]

    def run_decode(r):
        def f(i):
            _force(r.vae_decode([x + i for x in lats])[-1])
        return f

    t_dec_seq = _timed(run_decode(seq), 1)
    t_dec_dp = _timed(run_decode(par), 1)

    noises = [jax.random.normal(jax.random.fold_in(key, 200 + i),
                                (p["lt"], dh, dw, cfg.vid_out_channels),
                                jnp.bfloat16) for i in range(n)]

    def run_dit(r):
        conds = [r.get_condition(z, z) for z in noises]

        def f(i):
            _force(r.inference(
                noises=[z + i for z in noises], conditions=conds,
                texts_pos=[txt] * n, texts_neg=[txt] * n,
                cfg_scale=1.0, steps=1)[-1])
        return f

    t_dit_seq = _timed(run_dit(seq), 1)
    t_dit_dp = _timed(run_dit(par), 1)
    try:
        return {
            "devices": n,
            "items": n,
            "vae_decode_seq_s": round(t_dec_seq, 3),
            "vae_decode_dp_s": round(t_dec_dp, 3),
            "vae_wave_speedup": round(t_dec_seq / t_dec_dp, 2),
            "dit_seq_s": round(t_dit_seq, 3),
            "dit_dp_s": round(t_dit_dp, 3),
            "dit_dp_speedup": round(t_dit_seq / t_dit_dp, 2),
        }
    finally:
        _delete_tree(params, vae.params, txt)


CORE = ("encode", "dit", "decode")
PHASES = {"encode": phase_encode, "dit": phase_dit, "decode": phase_decode,
          "dit_w8a8": phase_dit_w8a8, "dit_7b_q8": phase_dit_7b_q8,
          "dit_7b_w8a8": phase_dit_7b_w8a8, "dp_scaling": phase_dp_scaling}
# rough per-lane wall cost (warm compile cache) used only to decide
# whether an OPTIONAL lane still fits the budget; lanes can also be
# trimmed explicitly via BENCH_LANES (comma list, "" = core phases only).
# w8a8: on-device weight quantize + cached step executable (~4 min);
# 7B q8: 36-block on-device init/quantize + q8 step (~11 min warm).
# dp_scaling self-skips instantly on one device, so its estimate is tiny.
_EST_LANE_S = {"dit_w8a8": 250.0, "dit_7b_q8": 650.0, "dit_7b_w8a8": 650.0,
               "dp_scaling": 30.0}
_EST_PHASE_S = 600.0


def _lanes():
    env = os.environ.get("BENCH_LANES")
    if env is None:
        # Priority order under the budget estimator: 7B w8a8 (the int8-MXU
        # serving config, ~2x q8's matmul rate) outranks 7B q8, whose
        # 0.83 f/s is already on record from the round-3 capture.
        return ["dit_w8a8", "dit_7b_w8a8", "dit_7b_q8", "dp_scaling"]
    return [x for x in env.split(",") if x]


def _emit(times, error=None):
    """Print the cumulative result line for the phases measured so far."""
    have = [ph for ph in CORE if ph in times]
    total = sum(times[ph] for ph in have)
    partial = len(have) < len(CORE)
    out = {
        "metric": "3B end-to-end upscale 720p->4K frames/sec/chip "
                  "(VAE encode + 1-step DiT + tiled VAE decode)",
        "value": round(FRAMES / total, 4) if total else 0.0,
        "unit": "frames/sec",
        "vs_baseline": (round(FRAMES / total / A100_E2E_BASELINE_FPS, 3)
                        if total and not partial else None),
        "partial": partial,
        "phases_measured": sorted(times),
    }
    for ph in CORE:
        if ph in times:
            out[f"{ph}_s"] = round(times[ph], 3)
    if "dit" in times:
        fps = FRAMES / times["dit"]
        out["dit_frames_per_s"] = round(fps, 4)
        out["dit_vs_baseline"] = round(fps / A100_DIT_BASELINE_FPS, 3)
    if "dit_w8a8" in times:
        fps = FRAMES / times["dit_w8a8"]
        out["dit_w8a8_s"] = round(times["dit_w8a8"], 3)
        out["dit_w8a8_frames_per_s"] = round(fps, 4)
        out["dit_w8a8_vs_baseline"] = round(fps / A100_DIT_BASELINE_FPS, 3)
        if not partial:
            e2e = FRAMES / (times["encode"] + times["dit_w8a8"]
                            + times["decode"])
            out["e2e_w8a8_frames_per_s"] = round(e2e, 4)
            # The w8a8 lane is accuracy-gated (whole-pipeline PSNR >= 69 dB
            # vs the fp32 oracle, tests/test_pipeline_oracle.py), so the
            # headline is the best gated serving config (VERDICT r3 #3).
            if e2e > out["value"]:
                out["e2e_bf16_frames_per_s"] = out["value"]
                out["value"] = round(e2e, 4)
                out["vs_baseline"] = round(e2e / A100_E2E_BASELINE_FPS, 3)
                out["serving"] = "w8a8 DiT + bf16 VAE"
    if "dit_7b_q8" in times:
        fps = FRAMES / times["dit_7b_q8"]
        out["dit_7b_q8_s"] = round(times["dit_7b_q8"], 3)
        out["dit_7b_q8_frames_per_s"] = round(fps, 4)
        out["dit_7b_q8_vs_baseline"] = round(
            fps / A100_DIT_7B_BASELINE_FPS, 3)
    if "dit_7b_w8a8" in times:
        fps = FRAMES / times["dit_7b_w8a8"]
        out["dit_7b_w8a8_s"] = round(times["dit_7b_w8a8"], 3)
        out["dit_7b_w8a8_frames_per_s"] = round(fps, 4)
        out["dit_7b_w8a8_vs_baseline"] = round(
            fps / A100_DIT_7B_BASELINE_FPS, 3)
    if "dp_scaling" in times:
        out["dp_scaling"] = times["dp_scaling"]
    if error is not None:
        out["error"] = str(error)[:500]
    line = json.dumps(out)
    print(line, flush=True)
    # Secondary artifact: the driver parses the last stdout line, which a
    # truncated tail can lose — also persist the latest cumulative result
    # to a file (atomic rename so a kill mid-write can't corrupt it).
    path = os.environ.get(
        "BENCH_RESULT_FILE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_result.json"))
    try:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(line + "\n")
        os.replace(tmp, path)
    except OSError:
        pass
    return out


def _acquire_backend():
    """Initialize the jax backend with retry/backoff.

    The axon dev tunnel serializes client sessions and takes 0.5-10 min
    to reap a dead one, so a transient UNAVAILABLE at init is an EXPECTED
    failure mode (it killed the round-2 and round-3 bench runs before a
    single JSON line was printed). jax re-runs backend discovery when the
    previous attempt left no live backend, so an in-process retry loop is
    enough — no subprocess probe (which would itself burn a session).

    Proves the session is actually usable with a tiny execute+fetch (the
    only reliable barrier through the dev client) before returning.
    """
    force_cpu = os.environ.get("BENCH_FORCE_CPU")
    if force_cpu:
        # Logic-testing escape hatch: the image's sitecustomize preloads
        # jax before bench.py runs, so JAX_PLATFORMS is too late — force
        # CPU via config (backend is still uninitialized here). A numeric
        # value > 1 additionally forces that many virtual CPU devices,
        # which exercises the dp_scaling lane without hardware.
        if force_cpu.isdigit() and int(force_cpu) > 1:
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    f"{flags} --xla_force_host_platform_device_count="
                    f"{int(force_cpu)}").strip()
        import jax

        jax.config.update("jax_platform_name", "cpu")
        jax.config.update("jax_platforms", "cpu")
    from seedvr2_tpu.utils.backend import acquire_backend

    # With nothing measured yet, the whole budget is worthless unless a
    # backend comes up — so spend up to 80% of it retrying acquisition
    # (the old min(600, 0.4*budget) cap stranded 900s of a 1500s budget
    # in round 4 while the tunnel was recovering). This runs exactly once,
    # before any phase; mid-run re-acquisition is _reacquire's job (bounded
    # by the remaining budget, since a partial result is already in hand).
    retry_budget = 0.8 * _budget()
    backend, _ = acquire_backend(
        give_up=lambda next_delay: _elapsed() + next_delay > retry_budget,
        note=_note)
    return backend


# Error text that indicates the tunnel/backend died (retryable), as opposed
# to a real bug in the phase code (not retryable).
_TRANSIENT = ("UNAVAILABLE", "FAILED_PRECONDITION", "FailedPrecondition",
              "DEADLINE_EXCEEDED", "Unable to initialize backend",
              "Socket closed", "Connection reset", "INTERNAL")

# INTERNAL also prefixes deterministic compiler failures; retrying those
# re-burns the budget on a failure that cannot succeed.
_NOT_TRANSIENT = ("Mosaic failed", "Internal error in XLA",
                  "RET_CHECK", "compilation failure")


def _is_transient(exc: Exception) -> bool:
    s = repr(exc)
    if any(t in s for t in _NOT_TRANSIENT):
        return False
    return any(t in s for t in _TRANSIENT)


def _reacquire() -> bool:
    """Best-effort backend re-acquisition after a transient mid-run failure.

    Returns True if a backend answered a probe compute. Bounded by the
    remaining wall budget (minus a grace slice so at least one more phase
    can still run)."""
    from seedvr2_tpu.utils.backend import acquire_backend

    try:
        acquire_backend(
            give_up=lambda next_delay: (
                _elapsed() + next_delay > _budget() - _EST_PHASE_S),
            note=_note)
        return True
    except Exception as exc:  # noqa: BLE001 — give up, keep partials
        _note(f"re-acquire gave up: {exc!r}")
        return False


# Shared with the SIGTERM handler so a driver timeout still flushes a
# final cumulative JSON line before the process dies.
_TIMES: dict = {}


def _on_term(signum, frame):  # noqa: ARG001
    _note(f"signal {signum}: emitting final result line")
    try:
        _emit(_TIMES, error=f"terminated by signal {signum}")
    finally:
        os._exit(0)


def _run_phases(p):
    times = _TIMES
    for ph in CORE:
        _note(f"phase {ph}: starting")
        for attempt in (1, 2):
            try:
                times[ph] = PHASES[ph](p)
                _note(f"phase {ph}: {times[ph]:.3f} s/iter")
                break
            except Exception as exc:  # noqa: BLE001 — always leave a JSON line
                _note(f"phase {ph} FAILED (attempt {attempt}): {exc!r}")
                # A tunnel drop mid-run is transient: re-acquire the backend
                # (bounded by the remaining budget) and retry the phase once
                # so one blip doesn't zero the rest of the run.
                if attempt == 1 and _is_transient(exc) and _reacquire():
                    _note(f"phase {ph}: backend re-acquired, retrying")
                    continue
                _sweep()
                _emit(times, error=f"phase {ph}: {exc!r}")
                break
        else:  # pragma: no cover — loop always breaks
            pass
        if ph in times:
            _sweep()
            _emit(times)

    for lane in _lanes():
        if _elapsed() + _EST_LANE_S.get(lane, _EST_PHASE_S) > _budget():
            _note(f"lane {lane}: skipped (budget: {_elapsed():.0f}s of "
                  f"{_budget():.0f}s spent)")
            continue
        _note(f"lane {lane}: starting")
        try:
            res = PHASES[lane](p)
            if res is None:  # lane self-skipped (e.g. dp on one device)
                continue
            times[lane] = res
            _note(f"lane {lane}: {res:.3f} s/iter"
                  if isinstance(res, float) else f"lane {lane}: {res}")
        except Exception as exc:  # noqa: BLE001 — lanes must not kill the run
            _note(f"lane {lane} FAILED: {exc!r}")
            _sweep()
            _emit(times, error=f"lane {lane}: {exc!r}")
            if _is_transient(exc):
                # Heal the backend so one blip doesn't doom later lanes.
                _reacquire()
            continue
        _sweep()
        _emit(times)


def _watchdog():
    """Self-terminate with a final JSON line if the main thread wedges.

    A tunnel stall blocks the main thread inside a C++ RPC, where neither
    Python exceptions nor the SIGTERM handler can run (signal handlers
    only fire between bytecodes). A daemon thread can still print and
    os._exit — so past the budget (+ grace for a last in-flight phase),
    emit whatever was measured and leave rc=0 instead of letting the
    driver's timeout produce `parsed: null`."""
    import threading

    deadline = 1.05 * _budget() + 120.0

    def run():
        while True:
            time.sleep(15.0)
            if _elapsed() > deadline:
                _note(f"watchdog: {_elapsed():.0f}s > {deadline:.0f}s "
                      "deadline, emitting and exiting")
                try:
                    _emit(_TIMES, error="watchdog timeout (main thread "
                                        "wedged past budget)")
                finally:
                    os._exit(0)

    threading.Thread(target=run, daemon=True, name="bench-watchdog").start()


def main():
    """Never exits non-zero, never ends without a parseable JSON line on
    stdout: backend init retries with backoff (transient tunnel outages
    are expected), a watchdog thread breaks RPC wedges, and ANY uncaught
    failure still emits a final cumulative result with an "error" field."""
    signal.signal(signal.SIGTERM, _on_term)
    _watchdog()
    try:
        from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

        enable_persistent_cache()
        p = _shapes(_acquire_backend() == "tpu")

        if len(sys.argv) > 1 and sys.argv[1] in PHASES:
            t = PHASES[sys.argv[1]](p)
            print(json.dumps({"phase": sys.argv[1], "seconds": t}),
                  flush=True)
            return

        _run_phases(p)
    except BaseException as exc:  # noqa: BLE001 — the contract is a JSON line
        if isinstance(exc, SystemExit) and not exc.code:
            raise
        _note(f"FATAL: {exc!r}")
        _emit(_TIMES, error=repr(exc))
        sys.exit(0)


if __name__ == "__main__":
    main()
