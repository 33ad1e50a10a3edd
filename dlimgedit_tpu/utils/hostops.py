"""Loader for the native host-ops library (native/src/hostops.cpp).

The channel-map pack on the Segmentation::process critical path is a pure
byte shuffle; numpy does it as three strided slice copies (~1.5 ms at
1024^2 rgba — 18% of the round-2 co-located e2e).  The native loop with a
persistent thread pool does it in ~0.2-0.4 ms, matching the reference's
C++ create_image_tensor discipline (segmentation.cpp:81-106).

Resolution order:
  1. ``DLIMG_HOSTOPS_LIB`` — explicit path (or "0"/"" to disable).
  2. ``native/build/libdlimg_hostops.so`` from a CMake build.
  3. Compile ``native/src/hostops.cpp`` on demand with g++ into
     ``~/.cache/dlimgedit_tpu/`` (keyed by source hash + machine), once.
Every failure degrades silently to the numpy path — the native op is a
pure accelerator, never a requirement (tests stay hermetic).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import sys
import tempfile
from pathlib import Path
from typing import Optional

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "src" / "hostops.cpp"
_ABI_VERSION = 2

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _configure(lib: ctypes.CDLL) -> Optional[ctypes.CDLL]:
    try:
        if lib.dlimg_hostops_abi_version() != _ABI_VERSION:
            return None
    except AttributeError:
        return None
    lib.dlimg_hostops_pack_rgb.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.dlimg_hostops_pack_rgb.restype = None
    lib.dlimg_hostops_resize_mask_box.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
    ]
    lib.dlimg_hostops_resize_mask_box.restype = None
    return lib


def _build_on_demand() -> Optional[Path]:
    if not _SRC.exists():
        return None
    src = _SRC.read_bytes()
    key = hashlib.sha256(
        src + platform.machine().encode() + str(_ABI_VERSION).encode()
    ).hexdigest()[:16]
    cache = Path(os.environ.get(
        "DLIMG_HOSTOPS_CACHE",
        os.path.expanduser("~/.cache/dlimgedit_tpu")))
    out = cache / f"hostops-{key}.so"
    if out.exists():
        return out
    try:
        cache.mkdir(parents=True, exist_ok=True)
        with tempfile.TemporaryDirectory(dir=cache) as td:
            tmp = Path(td) / out.name
            for extra in (["-march=native"], []):  # retry portable if needed
                cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                       "-std=c++17", *extra, str(_SRC), "-o", str(tmp)]
                r = subprocess.run(cmd, capture_output=True, timeout=120)
                if r.returncode == 0:
                    os.replace(tmp, out)  # atomic vs concurrent builders
                    return out
            print(f"hostops build failed: {r.stderr.decode()[:400]}",
                  file=sys.stderr)
    except (OSError, subprocess.SubprocessError):
        pass
    return None


def load() -> Optional[ctypes.CDLL]:
    """The host-ops library, or None (numpy fallback). Cached."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    explicit = os.environ.get("DLIMG_HOSTOPS_LIB")
    if explicit is not None:
        if explicit in ("", "0", "off"):
            return None
        try:
            _lib = _configure(ctypes.CDLL(explicit))
        except OSError:
            _lib = None
        return _lib
    # Try the prebuilt CMake library FIRST; the multi-second on-demand g++
    # compile only runs when no working prebuilt exists.
    prebuilt = _REPO / "native" / "build" / "libdlimg_hostops.so"
    for cand in (prebuilt, None):
        if cand is None:
            cand = _build_on_demand()
        if cand is None or not cand.exists():
            continue
        try:
            lib = _configure(ctypes.CDLL(str(cand)))
        except OSError:
            continue
        if lib is not None:
            _lib = lib
            return _lib
    return None


def pack_rgb(src, cmap, dst, h: int, w: int) -> bool:
    """Native channel-map pack src[:h, :w, cmap] -> dst[:h, :w, :3].

    src: uint8 (H, W, C) with contiguous pixels (strides (rs, C, 1));
    dst: uint8 (B, B, 3) C-contiguous canvas. Returns False when the
    native library is unavailable or the layout is unsupported (caller
    falls back to numpy)."""
    lib = load()
    if lib is None:
        return False
    c = src.shape[2]
    if (src.dtype.itemsize != 1 or dst.dtype.itemsize != 1
            or src.strides[2] != 1 or src.strides[1] != c
            or dst.strides[2] != 1 or dst.strides[1] != 3):
        return False
    # Bounds: the native loop trusts its arguments where numpy would raise
    # a broadcast error — an oversized h/w or channel index would be a
    # multi-MB heap overwrite, not an exception.
    if (h > dst.shape[0] or w > dst.shape[1]
            or h > src.shape[0] or w > src.shape[1] or max(cmap) >= c):
        return False
    lib.dlimg_hostops_pack_rgb(
        src.ctypes.data, src.strides[0], h, w, c,
        cmap[0], cmap[1], cmap[2],
        dst.ctypes.data, dst.strides[0], 0)
    return True


def resize_mask_box(src, dst) -> bool:
    """Native single-channel box-filter resize src (H, W) u8 -> dst (H', W')
    u8, the resize_mask semantics (image/resize.py) to within one grey
    level at .5 ties. Used by the Python-free serving shim's
    segment_objects (capi.cpp); exposed here for the parity test.
    Returns False when the native library is unavailable."""
    lib = load()
    if lib is None:
        return False
    if (src.dtype.itemsize != 1 or dst.dtype.itemsize != 1
            or src.strides[1] != 1 or dst.strides[1] != 1):
        return False
    lib.dlimg_hostops_resize_mask_box(
        src.ctypes.data, src.shape[0], src.shape[1], src.strides[0],
        dst.ctypes.data, dst.shape[0], dst.shape[1], dst.strides[0])
    return True
