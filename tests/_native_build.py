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


def ensure_native_build(target: Path) -> None:
    if target.exists():
        return
    if shutil.which("cmake") is None:
        pytest.skip("cmake not installed")
    if not (shutil.which("c++") or shutil.which("g++") or shutil.which("clang++")):
        pytest.skip("no C++ compiler installed")
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    r = subprocess.run(
        ["cmake", "-S", str(REPO / "native"), "-B", str(BUILD_DIR), *gen],
        capture_output=True, text=True)
    if r.returncode == 0:
        r = subprocess.run(["cmake", "--build", str(BUILD_DIR)],
                           capture_output=True, text=True)
    if r.returncode != 0:
        pytest.fail("native build failed with a working toolchain:\n"
                    + r.stdout[-800:] + r.stderr[-800:])
    if not target.exists():
        pytest.fail(f"native build succeeded but {target} was not produced")
