"""Profile one pipeline phase on the TPU and print a device-time op table.

Captures a jax.profiler trace around a single phase (same shapes/configs as
bench.py) and reduces the xplane to a per-category device-time breakdown
via xprof (tensorboard-plugin-profile). This is the tool behind the
"Device-time breakdown" tables in docs/performance.md.

Usage (on the TPU):
    python tools/profile_phase.py encode [--iters 1] [--outdir /tmp/prof]
    python tools/profile_phase.py decode
    python tools/profile_phase.py dit
"""

import argparse
import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _bootstrap  # noqa: F401,E402


def _categorize(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "conv"
    if any(k in n for k in ("dot", "matmul", "einsum")):
        return "matmul"
    if "custom-call" in n or "pallas" in n or "mosaic" in n:
        return "custom(pallas)"
    if any(k in n for k in ("dynamic-slice", "slice", "pad", "concatenate",
                            "reshape", "transpose", "copy", "gather",
                            "scatter", "select-and-scatter")):
        return "layout/copy"
    if any(k in n for k in ("reduce", "rsqrt", "mean")):
        return "reduce/norm"
    if any(k in n for k in ("fusion", "add", "multiply", "tanh", "exp",
                            "logistic", "divide", "convert", "maximum")):
        return "elementwise-fusion"
    return "other"


def run_phase(phase: str, outdir: str, iters: int):
    import jax

    import bench
    from seedvr2_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    p = bench._shapes(jax.default_backend() == "tpu")
    p = dict(p, iters=iters)
    fn = bench.PHASES[phase]
    # compile outside the trace so the capture is pure steady-state
    print(f"[profile] warm-up/compile of {phase} ...", flush=True)
    t_warm = fn(p)
    print(f"[profile] warm {phase}: {t_warm:.3f} s/iter; tracing ...",
          flush=True)
    with jax.profiler.trace(outdir):
        fn(p)


def summarize(outdir: str, top: int = 25):
    from xprof.convert import raw_to_tool_data as r2t

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {outdir}")
    data, _ = r2t.xspace_to_tool_data(paths, "framework_op_stats", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    # framework_op_stats returns a list of dicts with name/self time fields;
    # fall back to op_profile parsing if the schema differs
    ops = []
    if isinstance(rows, dict) and "data" in rows:
        rows = rows["data"]
    for r in rows:
        if not isinstance(r, dict):
            continue
        name = r.get("op_name") or r.get("name") or ""
        t_us = (r.get("total_self_time_us") or r.get("self_time_us")
                or r.get("total_self_time") or 0)
        if name and t_us:
            ops.append((name, float(t_us)))
    cats = collections.Counter()
    for name, t_us in ops:
        cats[_categorize(name)] += t_us
    total = sum(cats.values())
    print(f"\ndevice self-time by category (total {total / 1e6:.3f} s):")
    for cat, t_us in cats.most_common():
        print(f"  {cat:20s} {t_us / 1e6:8.3f} s  {100 * t_us / total:5.1f}%")
    print(f"\ntop {top} ops:")
    for name, t_us in sorted(ops, key=lambda x: -x[1])[:top]:
        print(f"  {t_us / 1e6:8.3f} s  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["encode", "decode", "dit",
                                      "dit_w8a8"])
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--summarize-only", action="store_true",
                    help="parse an existing trace dir, skip the run")
    args = ap.parse_args()
    outdir = args.outdir or f"/tmp/prof_{args.phase}"
    if not args.summarize_only:
        run_phase(args.phase, outdir, args.iters)
    summarize(outdir)


if __name__ == "__main__":
    main()
