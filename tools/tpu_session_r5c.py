"""One-process round-5c TPU capture: the pending in-context A/Bs.

Steps (most valuable first):
  1. head_decode_ab — full 4K serving tiled decode (1088 cap, aspect
     planner, 64 px overlap, conv_transpose upsample default):
     stock extend_head concat vs SEEDVR2_HEAD_CORRECTION (correction
     conv, bit-equal by linearity — tests/test_vae_parity.py).
  2. head_encode_ab — full 4K serving tiled encode (1536 cap): same A/B.
  3. fa_step       — DiT 3B serving 1-step with the first-k-block
     online-softmax skip (commit 07b3dc4) now default. The prior kernel
     is gone, so this is a measurement, not an A/B; prior-session
     anchors: 2.474 s (r5 bf16_mxu), 2.482 s (r4 fp32 operands).

Same harness discipline as tools/tpu_session_r5.py: one session, guarded
steps logged as JSON lines, restart-resumable, watchdog exit 3 on wedges.
Each timed A/B: compile pass + >=3 timed reps, median + spread.
"""

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session_r5c.jsonl"
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

    threading.Thread(target=run, daemon=True, name="r5c-watchdog").start()


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
    fn(0)
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(i + 1)
        times.append(time.perf_counter() - t0)
    return {"median_s": round(statistics.median(times), 3),
            "min_s": round(min(times), 3), "max_s": round(max(times), 3),
            "reps": n}


# --------------------------------------------------------------- steps


def head_decode_ab():
    """Full 4K serving tiled decode: extend_head concat vs correction
    conv. Fresh VideoVAE per variant (fresh jit wrappers re-trace the
    module switch; pipeline_vae snapshots it for the memplan key)."""
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
    for tag, flag in (("concat", False), ("head_correction", True)):
        M._HEAD_CORRECTION = flag
        vae = VideoVAE(params, VAE_V3)

        def run(i):
            _force(vae.decode(z + i, tiled=True, tile_size=(1088, 1088),
                              tile_overlap=(64, 64), tile_mode="uniform"))

        out[tag] = _reps(run, 3)
        out[tag]["n_tiles"] = len(vae.last_decode_tiles or [])
        del vae
    M._HEAD_CORRECTION = os.environ.get("SEEDVR2_HEAD_CORRECTION", "0") == "1"
    for leaf in jax.tree.leaves(params):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001
            pass
    z.delete()
    return out


def head_encode_ab():
    """Full 4K serving tiled encode (1536 cap): same A/B."""
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import VAE_V3
    from seedvr2_tpu.models.vae import model as M
    from seedvr2_tpu.models.vae.pipeline_vae import VideoVAE, init_vae_params

    key = jax.random.PRNGKey(0)
    params = init_vae_params(key, VAE_V3, dtype=jnp.bfloat16)
    video = jax.random.uniform(jax.random.fold_in(key, 1),
                               (1, 5, 2160, 3840, 3), jnp.bfloat16,
                               -1.0, 1.0)
    out = {}
    for tag, flag in (("concat", False), ("head_correction", True)):
        M._HEAD_CORRECTION = flag
        vae = VideoVAE(params, VAE_V3)

        def run(i):
            _force(vae.encode(video + (i * 1e-4), tiled=True,
                              tile_size=(1536, 1536), tile_overlap=(64, 64),
                              tile_mode="uniform"))

        out[tag] = _reps(run, 3)
        del vae
    M._HEAD_CORRECTION = os.environ.get("SEEDVR2_HEAD_CORRECTION", "0") == "1"
    for leaf in jax.tree.leaves(params):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001
            pass
    video.delete()
    return out


def fa_step():
    """DiT 3B serving 1-step denoise with the first-k-block softmax-skip
    kernel (now the only kernel). Anchors: 2.474 s (r5), 2.482 s (r4)."""
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import DIT_3B, RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params

    key = jax.random.PRNGKey(0)
    lt, lh, lw, txt_len = 2, 270, 480, 58
    params = init_dit_params(key, DIT_3B, dtype=jnp.bfloat16)
    txt = jax.random.normal(jax.random.fold_in(key, 3),
                            (txt_len, DIT_3B.txt_in_dim), jnp.bfloat16)
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

    out = _reps(run, 3)
    del runner
    for leaf in jax.tree.leaves(params):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001
            pass
    txt.delete()
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

    guard("head_decode_ab", head_decode_ab)
    _sweep()
    guard("head_encode_ab", head_encode_ab)
    _sweep()
    guard("fa_step", fa_step)

    log({"step": "session_done", "ok": True})


if __name__ == "__main__":
    main()
