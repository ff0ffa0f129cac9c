"""One-process round-5 TPU capture (VERDICT r4 items 2, 3, 6).

Same harness discipline as tools/tpu_session_r4.py: one session (the axon
tunnel serializes clients), every step guarded, results appended as JSON
lines so a mid-run death loses nothing, a watchdog exits 3 on wedges so a
supervisor can restart, and completed steps are skipped on restart.

Order (most valuable first):
  1. fa_mxu_ab      — DiT 3B bf16 step: fp32 vs bf16 MXU attention operands
                      (VERDICT #6; target <= 2.30 s/step from 2.48)
  2. upsample_ab    — full 4K tiled decode: pixel-shuffle transpose vs
                      lhs-dilated conv upsample (VERDICT #3)
  3. decode frontier— mem probes 1280/1536/1792 + runs where they fit
                      (VERDICT #2; r4 failures were compile-service 500s)
  4. encode frontier— mem probes 1536/2176 + runs
Each timed A/B runs >=3 repetitions and reports median + spread
(ADVICE r4 #2).
"""

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session_r5.jsonl"
HBM_BUDGET_GIB = 15.5
ACQUIRE_DEADLINE_S = 900.0
STEP_DEADLINE_S = 2400.0

_last_progress = time.monotonic()
_acquired = threading.Event()


def log(obj):
    global _last_progress
    _last_progress = time.monotonic()
    line = json.dumps(obj)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def _done_steps():
    done = {}
    try:
        with open(LOG) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("ok") and rec.get("step"):
                    done[rec["step"]] = rec.get("result")
    except OSError:
        pass
    return done


_DONE = _done_steps()


def guard(name, fn):
    if name in _DONE:
        print(f"# skip {name} (already captured)", flush=True)
        return _DONE[name]
    t0 = time.perf_counter()
    try:
        out = fn()
        log({"step": name, "ok": True,
             "wall_s": round(time.perf_counter() - t0, 1),
             **({"result": out} if isinstance(out, dict) else {})})
        return out
    except Exception as exc:  # noqa: BLE001 — keep the session alive
        log({"step": name, "ok": False, "error": repr(exc)[:400],
             "wall_s": round(time.perf_counter() - t0, 1)})
        return None


def _watchdog():
    def run():
        t0 = time.monotonic()
        while True:
            time.sleep(15)
            if not _acquired.is_set():
                if time.monotonic() - t0 > ACQUIRE_DEADLINE_S:
                    print("# watchdog: backend acquire wedged, exit 3",
                          flush=True)
                    os._exit(3)
            elif time.monotonic() - _last_progress > STEP_DEADLINE_S:
                print("# watchdog: no step progress, exit 3", flush=True)
                os._exit(3)

    threading.Thread(target=run, daemon=True, name="r5-watchdog").start()


def _force(x):
    import jax.numpy as jnp

    return float(jnp.mean(x.astype(jnp.float32)))


def _sweep():
    import gc

    import jax

    gc.collect()
    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:  # noqa: BLE001
            pass


def _reps(fn, n=3):
    """Compile once, then n timed executions -> median + spread."""
    fn(0)
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(i + 1)
        times.append(time.perf_counter() - t0)
    return {"median_s": round(statistics.median(times), 3),
            "min_s": round(min(times), 3), "max_s": round(max(times), 3),
            "reps": n}


# --------------------------------------------------------------- step 1


def fa_mxu_ab():
    """DiT 3B bf16 1-step denoise at the bench serving shape, fp32-MXU
    attention operands (round-4 behavior) vs bf16 (round-5 default)."""
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import DIT_3B, RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(0)
    lt, lh, lw, txt_len = 2, 270, 480, 58
    params = init_dit_params(key, DIT_3B, dtype=jnp.bfloat16)
    txt = jax.random.normal(jax.random.fold_in(key, 3),
                            (txt_len, DIT_3B.txt_in_dim), jnp.bfloat16)
    out = {}
    for tag, dtype in (("fp32_mxu", jnp.float32), ("bf16_mxu", jnp.bfloat16)):
        fa._MXU_DTYPE = dtype  # test-only mutation, fresh runner per variant
        runner = VideoDiffusionRunner(params, DIT_3B, vae=None,
                                      config=RunnerConfig(dit=DIT_3B))

        def run(i):
            noise = jax.random.normal(
                jax.random.fold_in(key, 2000 + i),
                (lt, lh, lw, DIT_3B.vid_out_channels), jnp.bfloat16)
            blur = jax.random.normal(jax.random.fold_in(key, 3000 + i),
                                     noise.shape, jnp.bfloat16)
            cond = runner.get_condition(noise, blur)
            _force(runner.inference(
                noises=[noise], conditions=[cond], texts_pos=[txt],
                texts_neg=[txt], cfg_scale=1.0, steps=1)[0])

        out[tag] = _reps(run, 3)
        del runner
    fa._MXU_DTYPE = jnp.bfloat16
    from seedvr2_tpu.core.model_manager import _tree_bytes  # noqa: F401

    for leaf in jax.tree.leaves(params):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001
            pass
    txt.delete()
    return out


# --------------------------------------------------------------- step 2


def upsample_ab():
    """Full 4K tiled decode (serving plan: 1088 cap, aspect planner,
    64 px overlap): stock pixel-shuffle vs lhs-dilated conv upsample.
    Fresh VideoVAE per variant — the tiled-scan jit cache keys on shape,
    not on the module switch (ADVICE r4 #3 pattern)."""
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae import model as M
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, VAE_V3, dtype=jnp.bfloat16)
    z = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 270, 480, 16),
                          jnp.bfloat16)
    out = {}
    for tag, flag in (("pixel_shuffle", False), ("conv_transpose", True)):
        M._UPSAMPLE_CONVT = flag
        vae = VideoVAE(params, VAE_V3)

        def run(i):
            _force(vae.decode(z + i, tiled=True, tile_size=(1088, 1088),
                              tile_overlap=(64, 64), tile_mode="uniform"))

        out[tag] = _reps(run, 3)
        out[tag]["n_tiles"] = len(vae.last_decode_tiles or [])
        del vae
    M._UPSAMPLE_CONVT = os.environ.get("SEEDVR2_UPSAMPLE_CONVT", "1") == "1"
    for leaf in jax.tree.leaves(params):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001
            pass
    z.delete()
    return out


# ----------------------------------------------------------------- main


def main():
    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    _watchdog()

    from seedvr2_tpu.utils.backend import acquire_backend

    backend, n_dev = acquire_backend(
        note=lambda m: print(f"# {m}", flush=True))
    _acquired.set()
    log({"step": "backend", "backend": backend, "devices": n_dev})
    if backend != "tpu":
        print("# not a TPU backend, exit 4", flush=True)
        os._exit(4)

    guard("fa_mxu_ab", fa_mxu_ab)
    _sweep()
    guard("upsample_ab", upsample_ab)
    _sweep()

    from tools import tile_probe

    runnable = []
    for px in (1280, 1536, 1792):
        r = guard(f"decode_mem_{px}",
                  lambda p=px: tile_probe.probe_mem("decode", p))
        if r and r.get("ok") and r.get("total_gib", 99) < HBM_BUDGET_GIB:
            runnable.append(px)
    for px in runnable:
        guard(f"decode_run_{px}", lambda p=px: tile_probe.probe("decode", p))
        _sweep()

    enc_runnable = []
    for px in (1536, 2176):
        r = guard(f"encode_mem_{px}",
                  lambda p=px: tile_probe.probe_mem("encode", p))
        if r and r.get("ok") and r.get("total_gib", 99) < HBM_BUDGET_GIB:
            enc_runnable.append(px)
    for px in enc_runnable:
        if px == 1536:
            continue  # 1536 already the measured serving cap (r4: 4.71 s)
        guard(f"encode_run_{px}", lambda p=px: tile_probe.probe("encode", p))
        _sweep()

    log({"step": "session_done", "ok": True})


if __name__ == "__main__":
    main()
