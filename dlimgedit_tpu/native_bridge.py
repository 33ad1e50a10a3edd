"""Bridge functions for the native C ABI shim (native/src/capi.cpp).

The C shim (the rebuild's counterpart of /root/reference/src/dlimgedit.cpp)
embeds CPython and calls these functions with raw pointers (as integers);
this module does the numpy marshalling so the C side stays free of the
numpy C API. Pixel buffers are wrapped zero-copy with ctypes and copied
only where the ABI contract requires caller-owned output buffers
(same as the reference's out_masks writes, dlimgedit.cpp:61-68).

Configuration beyond dlimg_Options' two fields (backend, model_directory)
comes from environment variables:
  DLIMG_ALLOW_RANDOM_WEIGHTS=1  — permit random-initialised weights
  DLIMG_SAM_VARIANT=vit_b       — encoder variant (default mobile_sam)
  DLIMG_SAM_IMAGE_SIZE=512      — model input resolution (default 1024)
  DLIMG_COMPUTE_DTYPE=float32   — encoder compute dtype (default bfloat16)
  DLIMG_COMPILATION_CACHE=/path — persistent XLA compile cache (AOT reuse;
                                  pre-fill with tools/aot_warmup.py)
  DLIMG_SCALEOUT_DEVICES=0      — single-image latency scale-out over the
                                  backend's devices (Options.scaleout_devices:
                                  0 = all, 1 = off, N = that many)
  DLIMG_AMG_GRID=16             — generate_masks prompt-grid side for the
                                  embedded route (default 32; the serving
                                  route uses the bundle's exported grid)
"""

from __future__ import annotations

import ctypes
import os
import numpy as np

from .runtime.environment import Environment, is_supported
from .runtime.segmentation import Segmentation, segment_objects
from .types import Backend, Channels, Extent, Image, ImageView, Options, Point, Region

_CHANNELS = {1: Channels.mask, 3: Channels.rgb, 4: Channels.rgba,
             5: Channels.bgra, 6: Channels.argb}


def _wrap_pixels(ptr: int, width: int, height: int, channels: int,
                 stride: int) -> np.ndarray:
    c = _CHANNELS[channels]
    nch = 4 if channels in (5, 6) else channels
    stride = stride or width * nch
    buf = (ctypes.c_uint8 * (stride * height)).from_address(ptr)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(height, stride)
    return arr[:, : width * nch].reshape(height, width, nch)


def backend_supported(backend: int) -> bool:
    return is_supported(Backend.cpu if backend == 0 else Backend.gpu)


def create_environment(backend: int, model_directory: str) -> Environment:
    opts = Options(
        backend=Backend.cpu if backend == 0 else Backend.gpu,
        model_directory=model_directory,
        allow_random_weights=os.environ.get(
            "DLIMG_ALLOW_RANDOM_WEIGHTS", "0") == "1",
        sam_variant=os.environ.get("DLIMG_SAM_VARIANT", "mobile_sam"),
        sam_image_size=int(os.environ.get("DLIMG_SAM_IMAGE_SIZE", "1024")),
        compute_dtype=os.environ.get("DLIMG_COMPUTE_DTYPE", "bfloat16"),
        compilation_cache_dir=os.environ.get("DLIMG_COMPILATION_CACHE"),
        scaleout_devices=int(os.environ.get("DLIMG_SCALEOUT_DEVICES", "1")),
    )
    return Environment(opts)


def process(env: Environment, ptr: int, width: int, height: int,
            channels: int, stride: int) -> Segmentation:
    arr = _wrap_pixels(ptr, width, height, channels, stride)
    view = ImageView(arr, Extent(width, height), _CHANNELS[channels])
    return Segmentation.process(view, env)


def segmentation_extent(seg: Segmentation) -> tuple:
    return seg.extent.width, seg.extent.height


def compute_mask(seg: Segmentation, point, region, out_mask_ptrs,
                 out_acc_ptr: int) -> None:
    """point: (x, y) or None; region: (x0, y0, x1, y1) or None;
    out_mask_ptrs: list of 3 pointer ints (0 => unused). Slot-1 == 0 means
    single-mask mode (dlimgedit.impl.hpp:90-103 protocol)."""
    w, h = seg.extent.width, seg.extent.height
    single = out_mask_ptrs[1] == 0

    def write(ptr: int, image: Image):
        out = (ctypes.c_uint8 * (w * h)).from_address(ptr)
        np.frombuffer(out, dtype=np.uint8)[:] = image.pixels.ravel()

    if single:
        prompt = (Point(*point) if point is not None
                  else Region(Point(region[0], region[1]),
                              Point(region[2], region[3])))
        write(out_mask_ptrs[0], seg.compute_mask(prompt))
    else:
        assert point is not None
        masks = seg.compute_masks(Point(*point))
        acc = (ctypes.c_float * 3).from_address(out_acc_ptr)
        for i, m in enumerate(masks):
            write(out_mask_ptrs[i], m.image)
            acc[i] = m.accuracy


def compute_mask_batch(seg: Segmentation, prompts, is_region, n: int,
                       out_mask_ptrs, out_acc_ptr: int) -> None:
    """Batched decode over the C ABI: prompts is a flat int tuple [n*4]
    ({x,y,_,_} for points, {x0,y0,x1,y1} for boxes per is_region), masks
    written into n caller (w*h)-byte buffers, accuracies into a float[n]
    buffer when non-null. One device program (Segmentation.compute_mask_batch
    — BASELINE config 3)."""
    w, h = seg.extent.width, seg.extent.height
    plist = []
    for i in range(n):
        v = prompts[4 * i:4 * i + 4]
        if is_region[i]:
            plist.append(Region(Point(v[0], v[1]), Point(v[2], v[3])))
        else:
            plist.append(Point(v[0], v[1]))
    masks = seg.compute_mask_batch(plist)
    acc = (ctypes.c_float * n).from_address(out_acc_ptr) \
        if out_acc_ptr else None
    for i, m in enumerate(masks):
        out = (ctypes.c_uint8 * (w * h)).from_address(out_mask_ptrs[i])
        np.frombuffer(out, dtype=np.uint8)[:] = m.image.pixels.ravel()
        if acc is not None:
            acc[i] = m.accuracy


def generate_masks(seg: Segmentation, iou_thresh: float,
                   stability_thresh: float, nms_thresh: float,
                   max_masks: int, out_mask_ptrs, out_acc_ptr: int) -> int:
    """Automatic mask generation over the C ABI: writes up to max_masks
    (w*h)-byte masks + accuracies into caller buffers, returns the count."""
    w, h = seg.extent.width, seg.extent.height
    grid = int(os.environ.get("DLIMG_AMG_GRID", "32"))
    masks = seg.generate_masks(grid=grid, max_masks=max_masks,
                               iou_thresh=iou_thresh,
                               stability_thresh=stability_thresh,
                               nms_thresh=nms_thresh)
    acc = (ctypes.c_float * max_masks).from_address(out_acc_ptr) \
        if out_acc_ptr else None
    for i, m in enumerate(masks):
        out = (ctypes.c_uint8 * (w * h)).from_address(out_mask_ptrs[i])
        np.frombuffer(out, dtype=np.uint8)[:] = m.image.pixels.ravel()
        if acc is not None:
            acc[i] = m.accuracy
    return len(masks)


def run_segment_objects(env: Environment, ptr: int, width: int, height: int,
                        channels: int, stride: int, out_ptr: int) -> None:
    arr = _wrap_pixels(ptr, width, height, channels, stride)
    view = ImageView(arr, Extent(width, height), _CHANNELS[channels])
    mask = segment_objects(view, env)
    out = (ctypes.c_uint8 * (width * height)).from_address(out_ptr)
    np.frombuffer(out, dtype=np.uint8)[:] = mask.pixels.ravel()


def load_image(filepath: str) -> tuple:
    """Returns (width, height, channels, bytes) — the C side copies into a
    buffer it allocates (allocator separation, dlimgedit.cpp:92-94)."""
    img = Image.load(filepath)
    return (img.extent.width, img.extent.height,
            img.pixels.shape[2], img.pixels.tobytes())


def save_image(ptr: int, width: int, height: int, channels: int, stride: int,
               filepath: str) -> None:
    arr = _wrap_pixels(ptr, width, height, channels, stride)
    Image.save(ImageView(arr, Extent(width, height), _CHANNELS[channels]),
               filepath)
