"""Tracing / profiling utilities (aux subsystem; SURVEY.md §5).

The reference has no observability at all (no timers, telemetry disabled).
Here: a per-executable call-latency recorder wired into the Environment's
executable cache, and a thin wrapper over jax.profiler for XPlane traces
viewable in TensorBoard/Perfetto.

Note on remote-attached TPUs: `block_until_ready` can return at dispatch
acknowledgement; wall-clock numbers here measure the host-visible latency.
For on-chip truth use `xplane_trace` (device timeline) or chained-execution
benchmarks (bench.py --true-device).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict


@dataclass
class CallStats:
    count: int = 0
    total_ms: float = 0.0
    min_ms: float = float("inf")
    max_ms: float = 0.0

    def record(self, ms: float) -> None:
        self.count += 1
        self.total_ms += ms
        self.min_ms = min(self.min_ms, ms)
        self.max_ms = max(self.max_ms, ms)

    @property
    def mean_ms(self) -> float:
        return self.total_ms / self.count if self.count else 0.0


class Profiler:
    """Per-key latency recorder (thread-safe)."""

    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self._stats: Dict[str, CallStats] = defaultdict(CallStats)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def measure(self, key: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1e3
            with self._lock:
                self._stats[key].record(ms)

    def wrap(self, key: str, fn):
        if not self.enabled:
            return fn

        def wrapped(*args, **kwargs):
            with self.measure(key):
                return fn(*args, **kwargs)

        return wrapped

    def stats(self) -> Dict[str, CallStats]:
        with self._lock:
            return dict(self._stats)

    def report(self) -> str:
        lines = [f"{'key':<48} {'count':>6} {'mean ms':>9} {'min':>8} {'max':>8}"]
        for key, s in sorted(self.stats().items()):
            lines.append(f"{key:<48} {s.count:>6} {s.mean_ms:>9.2f} "
                         f"{s.min_ms:>8.2f} {s.max_ms:>8.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def xplane_trace(log_dir: str):
    """Capture a device-timeline (XPlane) trace for TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
