"""Round-4 TPU capture, part B: decode tile ASPECT sweep.

Part A (tpu_session_r4.py) showed per-tile decode wall time varies ~30%
with tile aspect at equal area (139x126 latent tiles: 1.90 s/tile vs
round 3's 101x171: 1.42 s/tile), so redundant-FLOPs is not the planning
cost — this sweeps forced (nr x nc) grids at the 4K serving shape to find
the fastest serving grid, plus the round-3 128 px-overlap config as a
same-session baseline. Results append to the part-A JSONL; idempotent
across supervisor restarts.

Usage: python tools/tpu_session_r4b.py [/root/repo/tpu_session_r4.jsonl]
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _bootstrap  # noqa: F401,E402

LOG = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tpu_session_r4.jsonl"
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

    threading.Thread(target=run, daemon=True, name="r4b-watchdog").start()


def main():
    from seedvr2_tpu.utils.backend import acquire_backend
    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    _watchdog()
    backend, n_dev = acquire_backend(
        note=lambda m: print(f"# {m}", flush=True))
    _acquired.set()
    log({"step": "backend_b", "backend": backend, "devices": n_dev})
    if backend != "tpu":
        print("# not a TPU backend, exit 4", flush=True)
        os._exit(4)

    import jax

    from tools import tile_probe

    # Decode aspect candidates at the 64 px serving overlap; every tile
    # area is below the known-fitting 18496-latent-px point (15.3 GiB),
    # except (4,2)'s 18056 which sits just under it. (3,3)@128 reproduces
    # the round-3 serving config in this same session for a clean A/B.
    candidates = [
        ("decode_aspect_3x3_ov64", "decode", 3, 3, 64),    # 96x166
        ("decode_aspect_4x2_ov64", "decode", 4, 2, 64),    # 74x244 (wide)
        ("decode_aspect_5x2_ov64", "decode", 5, 2, 64),    # 61x244
        ("decode_aspect_4x3_ov64", "decode", 4, 3, 64),    # 74x166
        ("decode_aspect_3x3_ov128", "decode", 3, 3, 128),  # 101x171 = r3
        # encode aspect: both part-A encode points had th=139; test
        # whether the decoder's short-tile preference holds for the
        # encoder too (areas well under the known-fitting 33916)
        ("encode_aspect_4x2_ov64", "encode", 4, 2, 64),    # 74x244
        ("encode_aspect_3x2_ov64", "encode", 3, 2, 64),    # 96x244
        ("encode_aspect_2x2_ov64", "encode", 2, 2, 64),    # 139x244 = cap-1536 re-run (im2col conv_in in-context A/B)
    ]
    for name, kind, nr, nc, ov in candidates:
        guard(name, lambda a=(kind, nr, nc, ov): tile_probe.probe_aspect(
            a[0], a[1], a[2], a[3]))
        for arr in jax.live_arrays():
            try:
                arr.delete()
            except Exception:  # noqa: BLE001
                pass


if __name__ == "__main__":
    main()
