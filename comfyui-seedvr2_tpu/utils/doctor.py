"""`seedvr2 --doctor`: an environment health report for serving hosts.

The reference's troubleshooting story is a README FAQ; a production TPU
fleet needs the machine to diagnose itself. The report covers the four
things that actually go wrong in deployment: backend acquisition (the
dev tunnel wedges — probed under a watchdog so the doctor NEVER hangs),
the compile/memory-probe caches (cold caches explain "first run is
slow"), model/asset resolution (which search dirs, which checkpoints
and text embeddings were found), and the native extension. Exit 0 iff
the backend computed; 3 if it is unavailable/wedged.
"""

import os
import threading
import time
from typing import Optional

# how long a backend-init RPC may block before we call it wedged; the
# axon tunnel's session reaping takes 0.5-10 min, so a doctor probe past
# this is "down right now", not "broken forever"
BACKEND_PROBE_S = 60.0


def _dir_stats(path: str):
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
                n += 1
            except OSError:
                pass
    return n, total


def _probe_backend(timeout_s: float):
    """(status, detail) without ever hanging: backend init runs in a
    daemon thread; a wedged init RPC just strands that thread."""
    result = {}
    done = threading.Event()

    def run():
        try:
            import jax
            import jax.numpy as jnp

            t0 = time.perf_counter()
            backend = jax.default_backend()
            float(jnp.mean(jnp.ones((256, 256), jnp.bfloat16)
                           @ jnp.ones((256, 256), jnp.bfloat16)))
            dev = jax.devices()[0]
            result.update(
                ok=True, backend=backend, n_devices=len(jax.devices()),
                device_kind=getattr(dev, "device_kind", "?"),
                first_compute_s=round(time.perf_counter() - t0, 2))
            try:
                stats = dev.memory_stats() or {}
                if stats.get("bytes_limit"):
                    result["hbm_limit_gb"] = round(
                        stats["bytes_limit"] / 1e9, 1)
                if stats.get("bytes_in_use") is not None:
                    result["hbm_in_use_gb"] = round(
                        stats["bytes_in_use"] / 1e9, 2)
            except Exception:  # noqa: BLE001 — stats are best-effort
                pass
        except Exception as exc:  # noqa: BLE001
            result.update(ok=False, error=repr(exc)[:300])
        finally:
            done.set()

    threading.Thread(target=run, daemon=True, name="doctor-probe").start()
    if not done.wait(timeout_s):
        return {"ok": False,
                "error": f"backend init still blocked after {timeout_s:.0f}s"
                         " (tunnel down or another client holds the"
                         " session)"}
    return result


def run_doctor(model_dir: Optional[str] = None, echo=print) -> int:
    import platform
    import sys

    import jax
    import numpy as np

    echo("== seedvr2 doctor ==")
    echo(f"python {sys.version.split()[0]} | jax {jax.__version__} | "
         f"numpy {np.__version__} | {platform.platform()}")
    try:
        import cv2

        echo(f"opencv {cv2.__version__}")
    except ImportError:
        echo("opencv MISSING (video/image IO unavailable)")

    # native extension ---------------------------------------------------
    try:
        from ..ops import native

        state = ("loaded" if native.available()
                 else "NOT built (numpy fallbacks active)")
        echo(f"native C++ extension: {state}")
    except Exception as exc:  # noqa: BLE001
        echo(f"native C++ extension: error ({exc!r})")

    # caches -------------------------------------------------------------
    jd = os.environ.get("SEEDVR2_JIT_CACHE",
                        os.path.expanduser("~/.cache/seedvr2_tpu/jit"))
    if os.path.isdir(jd):
        n, total = _dir_stats(jd)
        echo(f"persistent jit cache: {jd} ({n} executables, "
             f"{total / 1e9:.2f} GB)")
    else:
        echo(f"persistent jit cache: {jd} (empty — first runs compile "
             "cold)")
    from . import memplan

    mp = memplan._cache_path()
    n_probes = len(memplan._load_cache()) if os.path.isfile(mp) else 0
    echo(f"memory-probe cache: {mp} ({n_probes} probed tile shapes)")

    # model/asset resolution ----------------------------------------------
    from .constants import candidate_model_dirs, find_model_path
    from .model_registry import DEFAULT_DIT, DEFAULT_VAE

    dirs = candidate_model_dirs(model_dir)
    echo(f"model search dirs: {dirs}")
    for name in (DEFAULT_DIT, DEFAULT_VAE):
        p = find_model_path(name, model_dir)
        echo(f"  {name}: {p or 'NOT FOUND (will attempt download)'}")
    from .text_embeds import find_embedding_path

    from .text_embeds import ASSETS_DIR

    for emb in ("pos", "neg"):
        found = find_embedding_path(emb, dirs)
        if found and os.path.dirname(found) == ASSETS_DIR:
            found = f"{found} (packaged published embeddings)"
        missing = ("NOT FOUND — published models will refuse to run "
                   "unconditioned (pass --allow_zero_embeddings to bench)")
        echo(f"  {emb}_emb: {found or missing}")

    # backend ------------------------------------------------------------
    echo(f"probing backend (<= {BACKEND_PROBE_S:.0f}s) ...")
    r = _probe_backend(BACKEND_PROBE_S)
    if r.get("ok"):
        echo(f"backend OK: {r['backend']} x{r['n_devices']} "
             f"({r['device_kind']}), first compute "
             f"{r['first_compute_s']}s"
             + (f", HBM {r.get('hbm_in_use_gb', 0)}/"
                f"{r['hbm_limit_gb']} GB"
                if "hbm_limit_gb" in r else ""))
        return 0
    echo(f"backend UNAVAILABLE: {r.get('error')}")
    if "still blocked" in str(r.get("error", "")):
        # The probe thread is stranded inside a wedged C++ init RPC;
        # normal interpreter teardown makes its C++ unwind call
        # std::terminate ("exception not rethrown" abort). Skip teardown:
        # the report is already printed and 3 is the documented code.
        import sys

        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(3)
    return 3
