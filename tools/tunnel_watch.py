"""Watch for the TPU tunnel to return; when it does, rebuild the wiped
compile caches and capture a fresh full bench.

The dev tunnel is a shared single-client session that goes down for long
stretches (three rounds of BENCH_r0N records show it). This watcher
turns tunnel recovery into a background workload:

  1. every --interval seconds, probe backend health in a SUBPROCESS with
     a hard timeout — the parent never touches jax, so a wedged RPC can
     never strand the session between probes;
  2. on the first healthy probe, run tools/warm_cache.py for the bench's
     core serving lanes (encode / decode / dit / dit_w8a8) so the
     persistent XLA cache (wiped with the machine image — doctor showed
     0 executables) is hot for the driver's round-end bench.py run;
  3. then run bench.py itself for an in-session verified capture
     (BENCH_RESULT_FILE as a secondary artifact);
  4. exit at --deadline seconds no matter what, killing any child, so
     the watcher can never hold the tunnel into the driver's window.

Usage:
    python tools/tunnel_watch.py --deadline 2100 --log /tmp/watch.jsonl
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = ("import jax; d = jax.devices(); "
         "print('DEVICES', len(d), d[0].platform)")


def log(fh, **kv):
    kv["t"] = round(time.time(), 1)
    fh.write(json.dumps(kv) + "\n")
    fh.flush()
    print(f"[watch] {kv}", file=sys.stderr, flush=True)


def run(cmd, timeout):
    """Run a child with a hard kill at timeout; return (rc, tail)."""
    try:
        r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=timeout)
        tail = (r.stdout + r.stderr)[-2000:]
        return r.returncode, tail
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"") + (e.stderr or b""))
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return -9, out[-2000:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline", type=float, default=2100.0,
                    help="hard exit after this many seconds")
    ap.add_argument("--interval", type=float, default=150.0)
    ap.add_argument("--probe_timeout", type=float, default=60.0)
    ap.add_argument("--log", default="/tmp/tunnel_watch.jsonl")
    ap.add_argument("--skip_bench", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    left = lambda: args.deadline - (time.time() - t0)  # noqa: E731
    fh = open(args.log, "a")
    log(fh, step="start", deadline=args.deadline)

    up = False
    while left() > args.probe_timeout + 10:
        rc, tail = run([sys.executable, "-c", PROBE],
                       timeout=args.probe_timeout)
        if rc == 0 and "DEVICES" in tail and "tpu" in tail:
            up = True
            log(fh, step="probe", up=True)
            break
        log(fh, step="probe", up=False, rc=rc,
            wait=round(min(args.interval, max(0, left() - 60)), 0))
        time.sleep(min(args.interval, max(0.0, left() - 60)))

    if not up:
        log(fh, step="done", result="tunnel_never_up",
            elapsed=round(time.time() - t0, 1))
        return 3

    # Phase 1: warm the persistent compile cache for the core serving
    # lanes. Each warm run is its own process (cache survives on disk),
    # bounded so the watcher always makes its deadline.
    warm_budget = min(1500.0, max(120.0, left() - 300.0))
    rc, tail = run([sys.executable, "tools/warm_cache.py", "--quant",
                    "w8a8"], timeout=warm_budget)
    log(fh, step="warm_w8a8", rc=rc, tail=tail[-400:])
    if left() > 420 and rc == 0:
        rc2, tail2 = run([sys.executable, "tools/warm_cache.py",
                          "--skip_vae"], timeout=min(600.0, left() - 240))
        log(fh, step="warm_bf16_dit", rc=rc2, tail=tail2[-300:])

    # Phase 2: a fresh verified full-bench capture on the warm cache.
    if not args.skip_bench and left() > 240:
        env = dict(os.environ,
                   BENCH_BUDGET_S=str(int(max(180, left() - 60))),
                   BENCH_RESULT_FILE=os.path.join(
                       ROOT, "bench_result_watch.jsonl"))
        try:
            r = subprocess.run([sys.executable, "bench.py"], cwd=ROOT,
                               capture_output=True, text=True,
                               timeout=max(120.0, left() - 30), env=env)
            last = [ln for ln in r.stdout.splitlines() if ln.strip()]
            log(fh, step="bench", rc=r.returncode,
                json_line=(last[-1] if last else None))
        except subprocess.TimeoutExpired:
            log(fh, step="bench", rc=-9, json_line=None)

    log(fh, step="done", result="ran", elapsed=round(time.time() - t0, 1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
