"""bench.py hang-watchdog: a mid-run relay death makes jax calls block
forever (CLAUDE.md); the watchdog must fire the CPU fallback when no
progress beat lands inside the budget, and must NOT fire while the
measurement loops keep beating.

Every test stops its watchdog before returning: a surviving thread would
later call the REAL _hang_fallback (monkeypatch restores it at teardown),
which execve's the pytest process into a full bench run.
"""

import importlib
import os
import sys
import threading
import time


def _load_bench():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    return importlib.reload(bench)


def test_watchdog_fires_on_stall(monkeypatch):
    monkeypatch.delenv("DLIMG_BENCH_REEXEC", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("DLIMG_BENCH_HANG_S", "0.3")
    bench = _load_bench()
    fired = threading.Event()
    monkeypatch.setattr(bench, "_hang_fallback", fired.set)
    stop = bench._start_watchdog()
    try:
        assert fired.wait(timeout=5.0), "watchdog never fired on a stall"
    finally:
        stop.set()


def test_watchdog_quiet_while_beating(monkeypatch):
    monkeypatch.delenv("DLIMG_BENCH_REEXEC", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("DLIMG_BENCH_HANG_S", "0.6")
    bench = _load_bench()
    fired = threading.Event()
    monkeypatch.setattr(bench, "_hang_fallback", fired.set)
    stop = bench._start_watchdog()
    try:
        for _ in range(8):
            bench._beat()
            time.sleep(0.15)
        assert not fired.is_set(), "watchdog fired despite progress beats"
    finally:
        stop.set()


def test_watchdog_disabled_on_cpu_reexec(monkeypatch):
    monkeypatch.setenv("DLIMG_BENCH_REEXEC", "1")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("DLIMG_BENCH_HANG_S", "0.1")
    bench = _load_bench()
    fired = threading.Event()
    monkeypatch.setattr(bench, "_hang_fallback", fired.set)
    assert bench._start_watchdog() is None
    time.sleep(0.4)
    assert not fired.is_set(), "watchdog must not run on the CPU fallback"


def test_watchdog_disabled_without_relay_transport(monkeypatch):
    """Local backends fail loudly instead of hanging; no relay env var ->
    no watchdog (a slow local compile must never trigger a restart)."""
    monkeypatch.delenv("DLIMG_BENCH_REEXEC", raising=False)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("DLIMG_BENCH_HANG_S", "0.1")
    bench = _load_bench()
    assert bench._start_watchdog() is None
