"""Persistent compilation cache (AOT executable reuse) tests.

The cache config is process-global, so the populate step runs in a
subprocess; the assertion is that executables were serialised to disk —
what a later process (Python or the native shim via DLIMG_COMPILATION_CACHE)
loads instead of recompiling."""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import numpy as np
import dlimgedit_tpu as dl

env = dl.Environment(dl.Options(
    backend=dl.Backend.cpu, allow_random_weights=True,
    compute_dtype="float32", sam_image_size=64,
    compilation_cache_dir=os.environ["CACHE_DIR"]))
img = dl.Image(dl.Extent(80, 60), dl.Channels.rgba,
               np.random.default_rng(0).integers(
                   0, 256, (60, 80, 4), dtype=np.uint8))
seg = dl.Segmentation.process(img, env)
seg.compute_mask(dl.Point(40, 30))
print("WARM_OK")
"""


def test_compilation_cache_is_populated(tmp_path):
    cache = tmp_path / "xla_cache"
    env = dict(os.environ, CACHE_DIR=str(cache), PYTHONPATH=str(REPO))
    r = subprocess.run([sys.executable, "-c", SCRIPT], env=env, text=True,
                       capture_output=True, timeout=540, cwd=str(REPO))
    assert r.returncode == 0 and "WARM_OK" in r.stdout, r.stderr[-1500:]
    entries = list(cache.rglob("*"))
    assert any(p.is_file() and p.stat().st_size > 0 for p in entries), (
        "no serialized executables written to the compilation cache")


def test_aot_warmup_tool_importable():
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import aot_warmup

        assert callable(aot_warmup.main)
    finally:
        sys.path.pop(0)
