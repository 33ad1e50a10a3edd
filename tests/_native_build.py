"""Shared native-shim build step for the C ABI / C++ API tests.

Skips ONLY when no toolchain exists (cmake or a C++ compiler genuinely
absent); a broken build on a machine that has the toolchain is a test
FAILURE, not a skip — otherwise a local "all green" run can silently never
touch the C ABI (the reference's C++ tests are its primary suite)."""

import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
BUILD_DIR = REPO / "native" / "build"


def _build(target: Path) -> str:
    """Build the native tree if `target` is absent.

    Returns "" when the target exists afterwards, "skip:<reason>" when no
    toolchain is available, or "fail:<log>" when a working toolchain
    produced a broken build.
    """
    if target.exists():
        return ""
    if shutil.which("cmake") is None:
        return "skip:cmake not installed"
    if not (shutil.which("c++") or shutil.which("g++") or shutil.which("clang++")):
        return "skip:no C++ compiler installed"
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    r = subprocess.run(
        ["cmake", "-S", str(REPO / "native"), "-B", str(BUILD_DIR), *gen],
        capture_output=True, text=True)
    if r.returncode == 0:
        r = subprocess.run(["cmake", "--build", str(BUILD_DIR)],
                           capture_output=True, text=True)
    if r.returncode != 0:
        return ("fail:native build failed with a working toolchain:\n"
                + r.stdout[-800:] + r.stderr[-800:])
    if not target.exists():
        return f"fail:native build succeeded but {target} was not produced"
    return ""


def ensure_native_build(target: Path) -> None:
    res = _build(target)
    if res.startswith("skip:"):
        pytest.skip(res[5:])
    if res:
        pytest.fail(res[5:])


def prebuild_native() -> None:
    """Best-effort whole-tree build that never skips or fails the caller.

    Tests whose SUBPROCESS outputs depend on which native artifacts exist
    must call this before spawning them: tools/aot_export.py records
    plugin_path.txt only if native/build/libdlimg_pjrt_cpu.so is already on
    disk, so on a fresh build dir an export-then-ensure_native_build order
    bakes an empty plugin path into the bundle (the ordering bug this
    helper exists to prevent). A broken build is NOT reported here — the
    test's own later ensure_native_build call fails loudly.
    """
    _build(BUILD_DIR / "test_bundle_parse")
