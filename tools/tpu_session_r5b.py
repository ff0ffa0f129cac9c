"""Round-5 follow-up TPU capture: the decode tile frontier with FORCED
narrow grids.

tpu_session_r5.py showed the >=1280 px caps failing in the compile
helper at the aspect planner's full-width (6,1)/(4,1) grids — but the
failing dimension may be tile SIZE, not cap: a (3,2) grid is ~the 1280
area and a (2,2) grid ~the 1536 area with half the width. Probe memory
first (compile-only), run what fits, and compare s/tile * n_tiles + the
blend redundancy against the serving (4,2) 11.36 s record.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session_r5b.jsonl"
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
    except Exception as exc:  # noqa: BLE001
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
                    print("# watchdog: acquire wedged, exit 3", flush=True)
                    os._exit(3)
            elif time.monotonic() - _last_progress > STEP_DEADLINE_S:
                print("# watchdog: no progress, exit 3", flush=True)
                os._exit(3)

    threading.Thread(target=run, daemon=True, name="r5b-watchdog").start()


def _sweep():
    import gc

    import jax

    gc.collect()
    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:  # noqa: BLE001
            pass


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
        os._exit(4)

    from tools import tile_probe

    # Narrow forced decode grids around the 1280/1536 areas. (4,2) is the
    # serving record-holder (11.36 s); fewer-tiles candidates: (3,2) six
    # tiles of ~98x250, (2,2) four tiles of ~143x250, (3,1) three
    # full-width (known helper-killer, kept as the control).
    runnable = []
    for nr, nc in ((3, 2), (2, 2)):
        r = guard(f"decode_aspect_mem_{nr}x{nc}",
                  lambda a=nr, b=nc: tile_probe.probe_aspect_mem(
                      "decode", a, b))
        if r and r.get("ok") and r.get("total_gib", 99) < HBM_BUDGET_GIB:
            runnable.append((nr, nc))
        _sweep()
    for nr, nc in runnable:
        guard(f"decode_aspect_run_{nr}x{nc}",
              lambda a=nr, b=nc: tile_probe.probe_aspect("decode", a, b))
        _sweep()

    log({"step": "session_done", "ok": True})


if __name__ == "__main__":
    main()
