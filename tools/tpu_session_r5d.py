"""One-process round-5d TPU capture: exp2-domain softmax A/B.

The serving flash kernels are VPU-bound at S~512 windows (40 TF/s,
docs/performance.md); folding log2(e) into the q scale turns every
softmax `exp` into the hardware-native `exp2`, deleting one (bq, bk)
VPU multiply per k-block (ops/flash_attention.py SEEDVR2_FA_EXP2).

Steps:
  1. fa_exp2_ab — DiT 3B serving 1-step denoise, stock exp vs exp2
     (fresh runner per variant; the traced HLO differs so the jit cache
     cannot cross-serve). Anchors: 2.468 s (r5c fa_step), 2.474 s (r5).

Same harness discipline as tools/tpu_session_r5c.py: one session,
guarded steps logged as JSON lines, restart-resumable, watchdog exit 3.
"""

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session_r5d.jsonl"
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

    threading.Thread(target=run, daemon=True, name="r5d-watchdog").start()


def _force(x):
    import jax.numpy as jnp

    return float(jnp.mean(x.astype(jnp.float32)))


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


def fa_exp2_ab():
    import jax
    import jax.numpy as jnp

    from seedvr2_tpu.core.configs import DIT_3B, RunnerConfig
    from seedvr2_tpu.core.runner import VideoDiffusionRunner
    from seedvr2_tpu.models.dit.nadit import init_dit_params
    from seedvr2_tpu.ops import flash_attention as F

    key = jax.random.PRNGKey(0)
    lt, lh, lw, txt_len = 2, 270, 480, 58
    params = init_dit_params(key, DIT_3B, dtype=jnp.bfloat16)
    txt = jax.random.normal(jax.random.fold_in(key, 3),
                            (txt_len, DIT_3B.txt_in_dim), jnp.bfloat16)
    out = {}
    for tag, flag in (("exp", False), ("exp2", True)):
        F._EXP2 = flag
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
    F._EXP2 = os.environ.get("SEEDVR2_FA_EXP2", "0") == "1"
    for leaf in jax.tree.leaves(params):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001
            pass
    txt.delete()
    return out


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

    guard("fa_exp2_ab", fa_exp2_ab)

    log({"step": "session_done", "ok": True})


if __name__ == "__main__":
    main()
