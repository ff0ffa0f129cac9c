"""Shared process-lifecycle harness for the one-process TPU capture tools.

Every tools/tpu_session_*.py capture follows the same discipline: one
session, steps guarded and logged as JSON lines, restart-resumable (a step
whose `ok` record is already in the log is skipped), a watchdog that exits 3
when backend acquisition or step progress wedges (tunnel outages are an
expected mode — a clean exit releases the tunnel and lets a retry loop
re-enter), timed A/Bs as median-of-N with a fresh warm-up rep.

Usage:
    h = SessionHarness(log_path)         # argv[1] default handled by caller
    h.start()                            # watchdog + persistent jit cache
    h.acquire()                          # backend up or exit 3/4
    h.guard("step_name", step_fn)        # logged, resumable
    h.done()

Earlier round-5 tools (tpu_session_r5/b/c.py) predate this module and carry
the harness inline; they are kept verbatim as the historical scripts behind
committed captures. New tools must use this module.
"""

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

HBM_BUDGET_GIB = 15.5  # v5e chip budget the memory probes compare against


class SessionHarness:
    def __init__(self, log_path: str, acquire_deadline_s: float = 900.0,
                 step_deadline_s: float = 2400.0):
        self.log_path = log_path
        self.acquire_deadline_s = acquire_deadline_s
        self.step_deadline_s = step_deadline_s
        self._last_progress = time.monotonic()
        self._acquired = threading.Event()
        self._done = self._done_steps()

    # ------------------------------------------------------------- log --

    def log(self, obj):
        self._last_progress = time.monotonic()
        line = json.dumps(obj)
        print(line, flush=True)
        with open(self.log_path, "a") as f:
            f.write(line + "\n")

    def _done_steps(self):
        done = {}
        try:
            with open(self.log_path) as f:
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

    def guard(self, name, fn):
        if name in self._done:
            print(f"# skip {name} (already captured)", flush=True)
            return self._done[name]
        t0 = time.perf_counter()
        try:
            out = fn()
            self.log({"step": name, "ok": True,
                      "wall_s": round(time.perf_counter() - t0, 1),
                      **({"result": out} if isinstance(out, dict) else {})})
            return out
        except Exception as exc:  # noqa: BLE001 — keep the session alive
            self.log({"step": name, "ok": False, "error": repr(exc)[:400],
                      "wall_s": round(time.perf_counter() - t0, 1)})
            return None

    # -------------------------------------------------------- lifecycle --

    def start(self):
        from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

        enable_persistent_cache()

        def run():
            t0 = time.monotonic()
            while True:
                time.sleep(15)
                if not self._acquired.is_set():
                    if time.monotonic() - t0 > self.acquire_deadline_s:
                        print("# watchdog: backend acquire wedged, exit 3",
                              flush=True)
                        os._exit(3)
                elif (time.monotonic() - self._last_progress
                      > self.step_deadline_s):
                    print("# watchdog: no step progress, exit 3", flush=True)
                    os._exit(3)

        threading.Thread(target=run, daemon=True,
                         name="session-watchdog").start()

    def acquire(self):
        from seedvr2_tpu.utils.backend import acquire_backend

        backend, n_dev = acquire_backend(
            note=lambda m: print(f"# {m}", flush=True))
        self._acquired.set()
        self.log({"step": "backend", "backend": backend, "devices": n_dev})
        if backend != "tpu":
            print("# not a TPU backend, exit 4", flush=True)
            os._exit(4)
        return backend

    def done(self):
        self.log({"step": "session_done", "ok": True})


# ------------------------------------------------------------- helpers --


def force(x):
    """Reliable completion barrier on the dev tunnel (block_until_ready can
    return before the remote execution finishes; a scalar fetch cannot)."""
    import jax.numpy as jnp

    return float(jnp.mean(x.astype(jnp.float32)))


def sweep():
    """Drop every live device array (the dev tunnel defers frees; explicit
    deletion between steps keeps HBM headroom honest)."""
    import gc

    import jax

    gc.collect()
    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:  # noqa: BLE001
            pass


def reps(fn, n=3):
    """Median-of-n timing with one untimed warm-up call (compile +
    cache-warm); fn(i) must force completion before returning."""
    fn(0)
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(i + 1)
        times.append(time.perf_counter() - t0)
    return {"median_s": round(statistics.median(times), 3),
            "min_s": round(min(times), 3), "max_s": round(max(times), 3),
            "reps": n}
