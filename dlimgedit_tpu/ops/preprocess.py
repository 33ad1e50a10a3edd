"""Fused SAM image preprocessing — one XLA program from raw pixels to the
normalised, padded encoder input.

Replaces three host hot loops of the reference (SURVEY.md §3.2):
  * stb resize-longest-side        (image.cpp:37-51 via segmentation.cpp:60-70)
  * channel shuffle uint8->float   (create_image_tensor, segmentation.cpp:81-106)
  * normalise + pad to 1024^2      (baked into the ONNX encoder graph,
                                    script/export_models.py use_preprocess=True)

Host side only packs the raw uint8 RGB pixels into a bucketed canvas; resize
(antialiased bilinear, dynamic scale), normalisation and padding all run on
device with static shapes, so one compiled executable serves every image size
up to the bucket.
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Extent, ImageView, RGB_CHANNEL_MAP
from ..utils import hostops
from .resample import apply_resample, resample_matrix
from ..models.sam import SAM_PIXEL_MEAN, SAM_PIXEL_STD

# Canvas buckets: one compiled executable per bucket (SURVEY.md §7 step 2's
# static-shape discipline).
CANVAS_BUCKETS = (256, 512, 1024, 2048, 4096)


def pick_bucket(extent: Extent, buckets=CANVAS_BUCKETS) -> int:
    m = max(extent.width, extent.height)
    for b in buckets:
        if m <= b:
            return b
    return ((m + 1023) // 1024) * 1024  # oversized: round up to 1 KiB grid


# Rotating per-thread staging canvases (depth 2 per bucket).  The consumers
# of a packed canvas (sam_preprocess, the BiRefNet runner) read it through
# resample matrices that zero every weight outside the valid [:h, :w] region
# (resample.py `valid` mask), so a reused canvas needs NO zeroing and stale
# bytes from a previous image are mathematically inert.  Reuse is only safe
# when the previous `jax.device_put` of the same buffer has finished reading
# it: PJRT semantics are ImmutableUntilTransferCompletes — device_put may
# return while the copy is still in flight, so callers register the put via
# ``note_canvas_transfer`` and the pool refuses to hand a buffer back out
# until that array reports ready (falling back to a fresh allocation, which
# is exactly the unpooled cost).  XLA:CPU additionally may alias aligned
# numpy arrays zero-copy for the array's whole lifetime, which no readiness
# check covers; callers therefore still gate pooling on platform != "cpu".
_POOL_DEPTH = 2
_canvas_pool = threading.local()


def _transfer_done(xfer) -> bool:
    try:
        return bool(xfer.is_ready())
    except Exception:
        return True  # deleted/donated arrays: transfer long finished


def staging_canvas(bucket: int) -> np.ndarray:
    """An uninitialised (bucket, bucket, 3) uint8 canvas from the per-thread
    rotation pool. Pack with ``pack_rgb_canvas(view, bucket, out=...)`` and,
    after ``jax.device_put``, register the result with
    ``note_canvas_transfer`` so the pool can track transfer completion."""
    bufs = getattr(_canvas_pool, "bufs", None)
    if bufs is None:
        bufs = _canvas_pool.bufs = {}
    ring = bufs.setdefault(bucket, [])
    if len(ring) < _POOL_DEPTH:
        buf = np.empty((bucket, bucket, 3), dtype=np.uint8)
        ring.append([buf, None])
        return buf
    # Round-robin from the least-recently-issued buffer, skipping any whose
    # registered device_put has not completed yet.
    for i, entry in enumerate(ring):
        buf, xfer = entry
        if xfer is None or _transfer_done(xfer):
            entry[1] = None
            ring.append(ring.pop(i))  # most-recently-issued to the back
            return buf
    # Every pooled buffer still has a transfer in flight: hand out a fresh
    # unpooled canvas rather than corrupt one mid-copy.
    return np.empty((bucket, bucket, 3), dtype=np.uint8)


def note_canvas_transfer(canvas: np.ndarray, device_array) -> None:
    """Record the in-flight ``device_put`` of a pooled canvas (matched by
    buffer identity; unpooled canvases are ignored)."""
    bufs = getattr(_canvas_pool, "bufs", None)
    if not bufs:
        return
    for ring in bufs.values():
        for entry in ring:
            if entry[0] is canvas:
                entry[1] = device_array
                return


def pack_rgb_canvas(view: ImageView, bucket: int,
                    out: np.ndarray | None = None) -> np.ndarray:
    """Host-side: place RGB-mapped uint8 pixels top-left in a (bucket, bucket, 3)
    canvas. Channel mapping follows create_image_tensor
    (/root/reference/src/segmentation.cpp:81-97): mask->(0,0,0),
    bgra->(2,1,0), argb->(1,2,3), rgb/rgba->(0,1,2).

    With ``out=None`` a zeroed canvas is allocated (stale-byte-free, the
    conservative default). Passing ``out`` (e.g. from ``staging_canvas``)
    packs into it WITHOUT zeroing — valid because every consumer masks the
    region outside [:h, :w] (see ``staging_canvas``). The inner byte shuffle
    uses the native host-ops loop when available (~5x over numpy's strided
    slice copies at 1024^2; utils/hostops.py)."""
    arr = view.pixels
    if arr.ndim == 2:
        arr = arr[:, :, None]
    cmap = RGB_CHANNEL_MAP[view.channels]
    h, w = arr.shape[:2]
    canvas = np.zeros((bucket, bucket, 3), dtype=np.uint8) if out is None \
        else out
    if not hostops.pack_rgb(arr, cmap, canvas, h, w):
        canvas[:h, :w, 0] = arr[:, :, cmap[0]]
        canvas[:h, :w, 1] = arr[:, :, cmap[1]]
        canvas[:h, :w, 2] = arr[:, :, cmap[2]]
    return canvas


def sam_preprocess(canvas: jnp.ndarray, in_h, in_w, out_h, out_w,
                   image_size: int = 1024,
                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """Device-side fused preprocess.

    canvas: (S, S, 3) uint8, valid region [:in_h, :in_w].
    out_h/out_w: resize-longest-side target (max == image_size), traced.
    Returns (1, image_size, image_size, 3) normalised, zero-padded pixels.
    """
    S = canvas.shape[0]
    img = canvas.astype(jnp.float32)
    R = resample_matrix(image_size, S, out_h, in_h, antialias=True)
    C = resample_matrix(image_size, S, out_w, in_w, antialias=True)
    x = apply_resample(R, C, img)
    mean = jnp.asarray(SAM_PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(SAM_PIXEL_STD, jnp.float32)
    x = (x - mean) / std
    # SAM pads the normalised image with zeros (original preprocess: normalize
    # then F.pad). Rows/cols beyond (out_h, out_w) are already zero from the
    # resample matrices ONLY in the value sense ((0-mean)/std != 0), so mask:
    i = jax.lax.broadcasted_iota(jnp.int32, (image_size, image_size, 1), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (image_size, image_size, 1), 1)
    inside = (i < out_h) & (j < out_w)
    x = jnp.where(inside, x, 0.0)
    return x[None].astype(compute_dtype)
