"""Observability: categorized logging, hierarchical timers, memory stats.

Re-creation of the reference Debug surface (src/utils/debug.py) adapted to
TPU: wall-clock phase timers with parent/child breakdowns, HBM usage via
jax.local_devices()[0].memory_stats(), host RAM via psutil, optional
jax.profiler trace capture around phases, and an FPS summary. Emoji noise is
dropped; categories are kept for log filtering.
"""

import contextlib
import os
import time
from typing import Dict, List, Optional

try:
    import psutil
except ImportError:  # pragma: no cover
    psutil = None


def _rank_tag() -> str:
    """' [rankN]' on multihost fleets, '' single-process (reference
    common/logger.py rank-tagged logging). Reads jax's DISTRIBUTED state
    (set only by jax.distributed.initialize, i.e. --num_hosts fleets) —
    never jax.process_count(), which would initialize a backend as a
    side effect of logging."""
    import sys

    if "jax" not in sys.modules:
        return ""
    try:
        from jax._src import distributed

        st = distributed.global_state
        if st.num_processes and st.num_processes > 1:
            return f" [rank{st.process_id}]"
    except Exception:  # noqa: BLE001 — private API drift: tag is optional
        pass
    return ""


class Debug:
    def __init__(self, enabled: bool = False, profile_dir: Optional[str] = None):
        self.enabled = enabled
        self.profile_dir = profile_dir
        self._timers: Dict[str, float] = {}
        self._elapsed: Dict[str, float] = {}
        self._stack: List[str] = []
        self._children: Dict[str, List[str]] = {}

    # ------------------------------------------------------------- logging

    def log(self, message: str, category: str = "info", level: str = "INFO",
            force: bool = False, indent_level: int = 0):
        if not (self.enabled or force):
            return
        indent = "  " * indent_level
        ts = time.strftime("%H:%M:%S")
        print(f"[{ts}]{_rank_tag()} [{category}] {indent}{message}",
              flush=True)

    # -------------------------------------------------------------- timers

    def start_timer(self, name: str):
        self._timers[name] = time.perf_counter()
        if self._stack:
            self._children.setdefault(self._stack[-1], []).append(name)
        self._stack.append(name)

    def end_timer(self, name: str, message: str = "",
                  show_breakdown: bool = False) -> float:
        start = self._timers.pop(name, None)
        if name in self._stack:
            self._stack = self._stack[: self._stack.index(name)]
        if start is None:
            return 0.0
        elapsed = time.perf_counter() - start
        self._elapsed[name] = elapsed
        if message:
            self.log(f"{message}: {elapsed:.2f}s", category="timer")
        if show_breakdown:
            for child in self._children.get(name, []):
                if child in self._elapsed:
                    self.log(f"  {child}: {self._elapsed[child]:.2f}s",
                             category="timer", indent_level=1)
        return elapsed

    def elapsed(self, name: str) -> float:
        return self._elapsed.get(name, 0.0)

    @contextlib.contextmanager
    def timer(self, name: str, message: str = ""):
        self.start_timer(name)
        try:
            yield
        finally:
            self.end_timer(name, message or name)

    @contextlib.contextmanager
    def profile(self, name: str):
        """jax.profiler trace around a phase (replaces the reference's
        homegrown VRAM checkpoints for kernel-level analysis)."""
        if self.profile_dir:
            import jax

            with jax.profiler.trace(os.path.join(self.profile_dir, name)):
                yield
        else:
            yield

    # -------------------------------------------------------------- memory

    def memory_state(self) -> Dict[str, float]:
        stats: Dict[str, float] = {}
        try:
            import jax

            dev = jax.local_devices()[0]
            m = dev.memory_stats() or {}
            stats["hbm_used_gb"] = m.get("bytes_in_use", 0) / 1024**3
            stats["hbm_limit_gb"] = m.get("bytes_limit", 0) / 1024**3
            stats["hbm_peak_gb"] = m.get("peak_bytes_in_use", 0) / 1024**3
        except Exception:
            pass
        if psutil is not None:
            vm = psutil.virtual_memory()
            stats["ram_used_gb"] = (vm.total - vm.available) / 1024**3
            stats["ram_total_gb"] = vm.total / 1024**3
            # Process RSS is the observable behind the streaming CLI's
            # bounded-memory claim (--chunk_size): per-chunk checkpoints
            # must show a flat RSS profile (reference tracks it via psutil
            # in memory_manager.py:166-208).
            stats["rss_gb"] = psutil.Process().memory_info().rss / 1024**3
        return stats

    def log_memory_state(self, label: str, **_kwargs):
        if not self.enabled:
            return
        s = self.memory_state()
        parts = []
        if "hbm_used_gb" in s:
            parts.append(f"HBM {s['hbm_used_gb']:.2f}/{s.get('hbm_limit_gb', 0):.2f}GB"
                         f" (peak {s.get('hbm_peak_gb', 0):.2f}GB)")
        if "ram_used_gb" in s:
            parts.append(f"RAM {s['ram_used_gb']:.1f}/{s['ram_total_gb']:.1f}GB")
        if "rss_gb" in s:
            parts.append(f"RSS {s['rss_gb']:.2f}GB")
        self.log(f"{label}: {', '.join(parts)}", category="memory")

    # ------------------------------------------ checkpoints / env / summary

    def checkpoint(self, label: str) -> Dict[str, float]:
        """Named memory checkpoint with deltas vs the previous checkpoint
        (reference debug.py:346-592 memory checkpoints/diffs)."""
        state = self.memory_state()
        if not hasattr(self, "_checkpoints"):
            self._checkpoints: List = []
        prev = self._checkpoints[-1][1] if self._checkpoints else {}
        self._checkpoints.append((label, state))
        if self.enabled:
            deltas = []
            for key, short in (("hbm_used_gb", "HBM"), ("ram_used_gb", "RAM"),
                               ("rss_gb", "RSS")):
                if key in state and key in prev:
                    deltas.append(f"{short} {state[key] - prev[key]:+.2f}GB")
            extra = f" (delta {', '.join(deltas)})" if deltas else ""
            self.log_memory_state(f"checkpoint[{label}]")
            if extra:
                self.log(f"checkpoint[{label}]{extra}", category="memory")
        return state

    def log_environment(self):
        """Environment header (reference debug.py:153-214)."""
        if not self.enabled:
            return
        import platform

        parts = [f"python {platform.python_version()}",
                 platform.platform(terse=True)]
        try:
            import jax

            parts.append(f"jax {jax.__version__}")
            devs = jax.local_devices()
            parts.append(f"backend {jax.default_backend()} "
                         f"({len(devs)}x {devs[0].device_kind})")
        except Exception:  # noqa: BLE001
            pass
        try:
            import numpy as _np

            parts.append(f"numpy {_np.__version__}")
        except Exception:  # noqa: BLE001
            pass
        self.log(" | ".join(parts), category="env", force=True)

    def summary(self, swap_stats: Optional[Dict] = None):
        """End-of-job summary: peak memory + phase timer totals + swap
        telemetry (reference debug.py:594-736)."""
        if not self.enabled:
            return
        s = self.memory_state()
        if "hbm_peak_gb" in s and s["hbm_peak_gb"]:
            self.log(f"peak HBM {s['hbm_peak_gb']:.2f}GB "
                     f"of {s.get('hbm_limit_gb', 0):.2f}GB",
                     category="summary")
        phases = [(n, t) for n, t in self._elapsed.items()
                  if n.startswith("phase")]
        total = sum(t for _, t in phases)
        for name, t in phases:
            self.log(f"{name}: {t:.2f}s ({t / total:.0%})"
                     if total else f"{name}: {t:.2f}s", category="summary")
        if swap_stats and swap_stats.get("total_swaps"):
            self.log(
                f"blockswap: {swap_stats['block_swaps']} swaps, "
                f"stall avg {swap_stats.get('block_avg_ms', 0):.1f}ms, "
                f"one transfer {swap_stats.get('measured_transfer_ms', 0):.1f}ms",
                category="summary")


NULL_DEBUG = Debug(enabled=False)
