"""tools/aot_export.py produces a complete, well-formed export bundle.

Runs hermetically on CPU in a subprocess (the export serializes through
whatever PJRT backend is active; CPU executables serialize fine — only
the native PJRT replay, native/test/test_pjrt.cpp, needs the real plugin
and is exercised on hardware, BENCH_NOTES round 3)."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_aot_export_smoke_bundle(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "aot_export.py"),
         "--out", str(tmp_path), "--program", "smoke"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]

    blob = (tmp_path / "smoke.pjrt").read_bytes()
    assert len(blob) > 100
    spec = json.loads((tmp_path / "smoke.spec.json").read_text())
    assert [i["dtype"] for i in spec["inputs"]] == ["float32", "float32"]
    assert spec["outputs"][0]["shape"] == [128, 128]

    # The expected output must equal the actual math of the program.
    a = np.load(tmp_path / "smoke.in0.npy")
    b = np.load(tmp_path / "smoke.in1.npy")
    want = np.load(tmp_path / "smoke.out0.npy")
    np.testing.assert_allclose(a @ b + 1.0, want, rtol=2e-5, atol=2e-5)

    # client_options.txt is the C-parsable mirror of client_options.json
    # (CPU backend registers no options; the FORMAT contract still holds).
    opts_json = json.loads((tmp_path / "client_options.json").read_text())
    lines = [ln for ln in (tmp_path / "client_options.txt")
             .read_text().splitlines() if ln]
    assert len(lines) == len(opts_json)
    for ln in lines:
        key, typ, _ = ln.split("\t", 2)
        assert typ in ("s", "i", "b")
        assert key in opts_json
