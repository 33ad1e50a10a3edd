"""Tests for the native `dlimg` command-line tool (native/tools/cli.cpp).

The model-free subcommands (info, apply-mask, arg validation) run as plain
subprocesses — they must work with NO Python environment at all (native
codecs). The model-backed `segment` run uses the same hermetic recipe as
test_native_cpp.py: embedded interpreter, CPU jax, random weights, tiny SAM,
and the suite's persistent XLA cache so warm runs are fast.
"""

import os
import subprocess
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
BIN = REPO / "native" / "build" / "dlimg"
CACHE = Path(__file__).resolve().parent / ".xla_cache"


def _ensure_cli():
    from _native_build import ensure_native_build

    ensure_native_build(BIN)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _read_png(path):
    from PIL import Image

    return np.asarray(Image.open(path))


def test_cli_usage_and_validation(tmp_path):
    _ensure_cli()
    # No args -> usage on stderr, exit 2.
    r = subprocess.run([str(BIN)], capture_output=True, text=True, timeout=60)
    assert r.returncode == 2
    assert "usage:" in r.stderr
    # Unknown command.
    r = subprocess.run([str(BIN), "florble"], capture_output=True, text=True,
                       timeout=60)
    assert r.returncode == 2
    # segment without a prompt.
    r = subprocess.run([str(BIN), "segment", "x.png"], capture_output=True,
                       text=True, timeout=60)
    assert r.returncode == 2
    assert "--point" in r.stderr
    # Malformed --point.
    r = subprocess.run([str(BIN), "segment", "x.png", "--point", "1;2"],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 2


def test_cli_info_reports_mode():
    _ensure_cli()
    env = {k: v for k, v in os.environ.items() if k != "DLIMG_PJRT_BUNDLE"}
    r = subprocess.run([str(BIN), "info"], capture_output=True, text=True,
                       env=env, timeout=60)
    assert r.returncode == 0
    assert "embedded-Python JAX" in r.stdout
    env["DLIMG_PJRT_BUNDLE"] = "/nonexistent/bundle"
    r = subprocess.run([str(BIN), "info"], capture_output=True, text=True,
                       env=env, timeout=60)
    assert r.returncode == 0
    assert "PJRT serving bundle" in r.stdout
    # Capability probe validates the bundle: a bogus path must not report
    # the accelerator backend as supported (ADVICE r3 fix, capi.cpp).
    assert "backend gpu: unavailable" in r.stdout


def test_cli_apply_mask_model_free(tmp_path):
    """apply-mask uses only the native codec layer — no model, no Python."""
    _ensure_cli()
    rgb = np.zeros((40, 60, 3), np.uint8)
    rgb[:, :, 0] = 180
    mask = np.zeros((40, 60), np.uint8)
    mask[10:30, 20:50] = 255
    _write_png(tmp_path / "in.png", rgb)
    _write_png(tmp_path / "mask.png", mask)
    out = tmp_path / "fg.png"
    r = subprocess.run(
        [str(BIN), "apply-mask", str(tmp_path / "in.png"),
         str(tmp_path / "mask.png"), "-o", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    fg = _read_png(out)
    assert fg.shape == (40, 60, 4)
    np.testing.assert_array_equal(fg[:, :, 3], mask)
    assert (fg[:, :, 0] == 180).all()
    # Extent mismatch is a clean error, not a crash.
    _write_png(tmp_path / "small.png", mask[:10, :10])
    r = subprocess.run(
        [str(BIN), "apply-mask", str(tmp_path / "in.png"),
         str(tmp_path / "small.png")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "match the image extent" in r.stderr


def test_cli_segment_end_to_end(tmp_path):
    """Full model-backed run: segment with a point and a box prompt, then
    --all with accuracies — hermetic (random weights, 64px SAM, CPU)."""
    _ensure_cli()
    rgb = np.zeros((48, 64, 3), np.uint8)
    rgb[12:36, 16:48] = [200, 40, 40]
    _write_png(tmp_path / "in.png", rgb)
    env = dict(os.environ)
    env.update({
        "DLIMG_ALLOW_RANDOM_WEIGHTS": "1",
        "DLIMG_SAM_IMAGE_SIZE": "64",
        "DLIMG_COMPUTE_DTYPE": "float32",
        "DLIMG_COMPILATION_CACHE": str(CACHE),
        "JAX_PLATFORMS": "cpu",  # embedded interpreter: no axon plugin
        "PYTHONPATH": str(REPO),
    })
    out = tmp_path / "m.png"
    r = subprocess.run(
        [str(BIN), "segment", str(tmp_path / "in.png"), "--backend", "cpu",
         "--point", "32,24", "--box", "16,12,48,36", "-o", str(out),
         "--time"],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-1000:]
    # Two prompts -> indexed outputs.
    m0 = _read_png(tmp_path / "m_0.png")
    m1 = _read_png(tmp_path / "m_1.png")
    assert m0.shape == (48, 64) and m1.shape == (48, 64)
    assert set(np.unique(m0)) <= {0, 255}
    assert "[dlimg] process" in r.stderr

    r = subprocess.run(
        [str(BIN), "segment", str(tmp_path / "in.png"), "--backend", "cpu",
         "--point", "32,24", "--all", "--cutout", "-o", str(out)],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-1000:]
    lines = [l for l in r.stdout.splitlines() if "accuracy=" in l]
    assert len(lines) == 3
    cut = _read_png(tmp_path / "m_1.png")
    assert cut.shape == (48, 64, 4)  # --cutout: RGBA with mask alpha


def test_cli_segment_all(tmp_path):
    """Automatic mask generation from the CLI (dlimg segment-all), hermetic:
    tiny grid via DLIMG_AMG_GRID, permissive thresholds, indexed outputs
    with accuracies best-first."""
    _ensure_cli()
    rgb = np.zeros((48, 64, 3), np.uint8)
    rgb[12:36, 16:48] = [200, 40, 40]
    _write_png(tmp_path / "in.png", rgb)
    env = dict(os.environ)
    env.update({
        "DLIMG_ALLOW_RANDOM_WEIGHTS": "1",
        "DLIMG_SAM_IMAGE_SIZE": "64",
        "DLIMG_COMPUTE_DTYPE": "float32",
        "DLIMG_COMPILATION_CACHE": str(CACHE),
        "DLIMG_AMG_GRID": "4",  # tiny grid: fast CPU compile
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
    })
    out = tmp_path / "obj.png"
    r = subprocess.run(
        [str(BIN), "segment-all", str(tmp_path / "in.png"), "--backend",
         "cpu", "--iou", "0.0", "--stability", "0.0", "--max-masks", "4",
         "-o", str(out), "--time"],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-1000:]
    lines = [l for l in r.stdout.splitlines() if "accuracy=" in l]
    assert 1 <= len(lines) <= 4
    accs = [float(l.split("accuracy=")[1]) for l in lines]
    assert accs == sorted(accs, reverse=True)
    m0 = _read_png(tmp_path / "obj_0.png")
    assert m0.shape == (48, 64)
    assert set(np.unique(m0)) <= {0, 255}
    assert "[dlimg] generate" in r.stderr
