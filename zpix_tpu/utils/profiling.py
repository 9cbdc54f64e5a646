"""Tracing, counters, and profiler hooks.

The reference has no observability at all (SURVEY.md sec.5: no timers, no
counters, std.log only).  This module supplies the framework-level
replacements:

* ``metrics`` — a process-wide counter/timer registry (decode counts,
  megapixels, per-stage wall time) that the batch pipelines feed.
* ``trace(name)`` — context manager timing a host-side stage.
* ``profile_trace(dir)`` — wraps jax.profiler.trace for device timelines
  (open the output with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict


class Metrics:
    """Thread-safe counters and stage timers."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counters: dict[str, float] = defaultdict(float)
        self.timers: dict[str, float] = defaultdict(float)
        self.timer_calls: dict[str, int] = defaultdict(int)

    def count(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self.counters[name] += value

    def add_time(self, name: str, seconds: float) -> None:
        with self._lock:
            self.timers[name] += seconds
            self.timer_calls[name] += 1

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "timers": {
                    k: {"total_s": v, "calls": self.timer_calls[k]}
                    for k, v in self.timers.items()
                },
            }

    def reset(self) -> None:
        with self._lock:
            self.counters.clear()
            self.timers.clear()
            self.timer_calls.clear()

    def report(self) -> str:
        """One aligned text table: counters, then per-stage timers with
        mean per call — the stage-budget view the perf work reads."""
        snap = self.snapshot()
        lines = []
        for k in sorted(snap["counters"]):
            lines.append(f"{k:<36} {snap['counters'][k]:>12.3f}")
        for k in sorted(snap["timers"]):
            t = snap["timers"][k]
            mean = t["total_s"] / max(t["calls"], 1)
            lines.append(
                f"{k:<36} {t['total_s'] * 1e3:>9.1f} ms "
                f"({t['calls']}x, {mean * 1e3:.2f} ms/call)"
            )
        return "\n".join(lines)


metrics = Metrics()


@contextlib.contextmanager
def trace(name: str, registry: Metrics = metrics):
    """Time a host-side stage into the registry."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        registry.add_time(name, time.perf_counter() - t0)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device profile (jax.profiler) for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
