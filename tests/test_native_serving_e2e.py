"""Hermetic end-to-end check of the native (Python-free) serving mode.

tools/serving_check.py --backend cpu drives the WHOLE stack with no
accelerator and no relay: aot_export writes a CPU bundle (DLIMGHLO1
pre-opt-HLO programs, plugin_path.txt -> libdlimg_pjrt_cpu.so), a golden
subprocess computes masks through the Python pipeline on XLA:CPU, and
native/build/test_serving runs the public C++ API (dlimgedit.hpp ->
capi.cpp DLIMG_PJRT_BUNDLE route -> pjrt_backend.cpp -> the repo's own
CPU PJRT plugin) in a fresh process with Python never initialised,
requiring pixel-exact agreement on all four legs (point mask, 3-mask
decode + iou, region prompt, non-square small image / second bucket).

Until round 4 this route could only be validated in live chip sessions
(BENCH_NOTES round 3); this is its CI-resident equivalent.
"""

import os
import subprocess
import sys

import pytest

from tests._native_build import BUILD_DIR, ensure_native_build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_native_serving_e2e_cpu(tmp_path):
    ensure_native_build(BUILD_DIR / "test_serving")
    if not (BUILD_DIR / "libdlimg_pjrt_cpu.so").exists():
        pytest.skip("libdlimg_pjrt_cpu.so not built "
                    "(tensorflow C++ libraries unavailable)")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    # conftest's 8-virtual-device XLA_FLAGS must not leak into the check:
    # the golden and the native process must compile identically (the flag
    # also reaches the plugin's XLA through the environment).
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "serving_check.py"),
         "--dir", str(tmp_path), "--size", "256", "--sam-image-size", "64",
         "--backend", "cpu", "--birefnet", "general:256",
         "--birefnet-resolution", "256", "--amg", "4:8"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "PASS: native serving mask pixel-exact" in r.stdout
    assert "0/65536 pixels differ" in r.stdout
    # segment_objects (BiRefNet) leg: the folded-head/banded-deform graph
    # must round-trip the native exporter/loader pixel-exactly too.
    assert "segment_objects" in r.stdout
    # generate_masks (AMG) leg: bit-exact selection + masks + accuracies
    # through the appended ABI entry.
    assert "generate_masks vs golden: 0/" in r.stdout
