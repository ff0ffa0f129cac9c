"""One-process round-4 TPU capture: tile probes + conv_in + fp8 studies.

The axon dev tunnel serializes client sessions and takes 0.5-10 min to
reap a dead one, so the round's pending hardware measurements run in ONE
process, each phase wrapped so an OOM or kernel failure doesn't kill the
rest. Results append as JSON lines to the log path given as the first
positional argument (default /tmp/tpu_session_r4.jsonl) as they land.

Order (most valuable first, in case the tunnel dies mid-run):
  1. decode tile memory probes (compile-only memory_analysis): 1280, 1536
  2. decode tile RUN probes for caps whose memory fits (< ~15.5 GiB)
  3. encode tile memory + run probes: 1536, 2176
  4. conv_in formulation study
  5. fp8 compute study re-capture (VERDICT r3 #4)
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_session_r4.jsonl"
HBM_BUDGET_GIB = 15.5
ACQUIRE_DEADLINE_S = 900.0   # backend init can hang (not error) when the
STEP_DEADLINE_S = 2400.0     # tunnel is down; a watchdog exits 3 so an
#                              outer supervisor loop can restart us.

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
    """Steps already captured OK in LOG (idempotent supervisor restarts),
    mapped to their recorded result so mem-gated downstream steps still
    see the numbers after a restart."""
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

    threading.Thread(target=run, daemon=True, name="r4-watchdog").start()


def _acquire_backend():
    """jax backend init via the shared retry helper (errors); the module
    watchdog covers *hangs* inside the init RPC. Retries forever — the
    outer supervisor loop owns the wall budget."""
    from seedvr2_tpu.utils.backend import acquire_backend

    backend, n_dev = acquire_backend(
        note=lambda m: print(f"# {m}", flush=True))
    _acquired.set()
    return backend, n_dev


def main():
    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    _watchdog()
    backend, n_dev = _acquire_backend()
    import jax

    log({"step": "backend", "backend": backend, "devices": n_dev})
    if backend != "tpu":
        print("# not a TPU backend, exit 4", flush=True)
        os._exit(4)

    from tools import tile_probe

    # 1+2: decode --------------------------------------------------------
    # 1088 is the serving default (2x4 of 139x126 at the 64 px serving
    # overlap); 1280/1536 are the next grid-frontier steps (2x3 / 2x2).
    runnable = [1088]
    for px in (1280, 1536):
        r = guard(f"decode_mem_{px}", lambda p=px: tile_probe.probe_mem("decode", p))
        if r and r.get("ok") and r.get("total_gib", 99) < HBM_BUDGET_GIB:
            runnable.append(px)
    for px in runnable:
        guard(f"decode_run_{px}", lambda p=px: tile_probe.probe("decode", p))

    # 3: encode ----------------------------------------------------------
    enc_runnable = [1024]
    for px in (1536, 2176):
        r = guard(f"encode_mem_{px}", lambda p=px: tile_probe.probe_mem("encode", p))
        if r and r.get("ok") and r.get("total_gib", 99) < HBM_BUDGET_GIB:
            enc_runnable.append(px)
    for px in enc_runnable:
        guard(f"encode_run_{px}", lambda p=px: tile_probe.probe("encode", p))

    # 3b: the runtime auto planner's verdict on this chip (what a user
    # passing --vae_*_tile_size auto would get at the 4K serving shape;
    # rides the probes above via the persistent memprobe/jit caches)
    def _auto_plan(kind):
        import jax.numpy as jnp

        from seedvr2_tpu.core.configs import VAE_V3
        from seedvr2_tpu.models.vae.pipeline_vae import (VideoVAE,
                                                         init_vae_params)
        from seedvr2_tpu.utils import memplan

        vae = VideoVAE(init_vae_params(jax.random.PRNGKey(0), VAE_V3,
                                       dtype=jnp.bfloat16), VAE_V3)
        budget = int(HBM_BUDGET_GIB * 1024 ** 3)
        plan = memplan.plan_auto_tile(
            vae, kind, (tile_probe.H4K // 8, tile_probe.W4K // 8), 1,
            tile_probe.FRAMES, (tile_probe.OV_PX,) * 2, budget)
        return {"kind": kind, "budget_gib": HBM_BUDGET_GIB,
                "auto_plan_px": plan}

    guard("auto_plan_decode", lambda: _auto_plan("decode"))
    guard("auto_plan_encode", lambda: _auto_plan("encode"))

    # free everything before the dense studies
    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:  # noqa: BLE001
            pass

    # 4: conv_in ---------------------------------------------------------
    from tools import conv_in_study

    guard("conv_in_study", lambda: conv_in_study.run())

    for a in jax.live_arrays():
        try:
            a.delete()
        except Exception:  # noqa: BLE001
            pass

    # 5: fp8 -------------------------------------------------------------
    from tools import fp8_study

    guard("fp8_study", lambda: fp8_study.main())


if __name__ == "__main__":
    main()
