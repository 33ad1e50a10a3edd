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

import os
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
        ring.append([buf, []])
        return buf
    # Round-robin from the least-recently-issued buffer, skipping any whose
    # registered device_put (possibly several, for row-chunked pipelined
    # transfers) has not completed yet.
    for i, entry in enumerate(ring):
        buf, xfers = entry
        if all(_transfer_done(x) for x in xfers):
            entry[1] = []
            ring.append(ring.pop(i))  # most-recently-issued to the back
            return buf
    # Every pooled buffer still has a transfer in flight: hand out a fresh
    # unpooled canvas rather than corrupt one mid-copy.
    return np.empty((bucket, bucket, 3), dtype=np.uint8)


def note_canvas_transfer(canvas: np.ndarray, device_array) -> None:
    """Record an in-flight ``device_put`` of a pooled canvas (matched by
    buffer identity — ``device_array`` may be a put of the whole canvas or
    of one of its row chunks; unpooled canvases are ignored). Completed
    transfers are pruned from EVERY entry on the way: a retained device
    array would otherwise pin its HBM canvas until that specific buffer
    is next reissued (a thread that processed one 4096-bucket image and
    then only serves 1024 traffic would hold 48 MB forever)."""
    bufs = getattr(_canvas_pool, "bufs", None)
    if not bufs:
        return
    base = canvas.base if canvas.base is not None else canvas
    for ring in bufs.values():
        for entry in ring:
            entry[1] = [x for x in entry[1] if not _transfer_done(x)]
            if entry[0] is base:
                entry[1].append(device_array)


def resolve_h2d_chunks(option_value: int, platform: str) -> int:
    """Resolve Options.h2d_overlap_chunks (0 = auto).

    Auto overlaps pack with per-chunk async H2D only where the DMA is
    real: co-located TPU gets 4 row chunks (the host pack of chunk i+1
    runs while chunk i's copy is in flight — device_put returns before
    the transfer completes). Through the axon relay every put pays a
    fixed per-op RPC (~0.7-2 ms each, CLAUDE.md), so extra puts cost more
    than the pack they hide; XLA:CPU may alias host memory zero-copy.
    Both resolve to 1 (the single-put baseline)."""
    if option_value:
        return max(1, int(option_value))
    if platform == "tpu" and not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return 4
    return 1


def pack_and_put_canvas(view: ImageView, bucket: int, device, *,
                        pooled: bool, n_chunks: int = 1):
    """Pack an image into a (bucket, bucket, 3) canvas and transfer it,
    overlapping host pack with H2D when ``n_chunks > 1`` (VERDICT r3 #6).

    Returns ``(parts, canvas)``: ``parts`` is a tuple of device arrays
    whose axis-0 concatenation is the full canvas (a 1-tuple for the
    single-put baseline). The chunked pipeline packs row block i, issues
    its asynchronous ``device_put``, then packs block i+1 while block i's
    copy is in flight; consumers re-join the blocks on device (a ~µs HBM
    copy) via :func:`join_canvas_parts`. Chunks never share rows, so a
    zero-copy-aliased chunk view can never observe a later block's pack.
    """
    arr = view.pixels
    if arr.ndim == 2:
        arr = arr[:, :, None]
    cmap = RGB_CHANNEL_MAP[view.channels]
    h, w = arr.shape[:2]
    canvas = staging_canvas(bucket) if pooled \
        else np.zeros((bucket, bucket, 3), dtype=np.uint8)
    if n_chunks <= 1:
        _pack_rows(arr, cmap, canvas, 0, h, w)
        part = jax.device_put(canvas, device)
        if pooled:
            note_canvas_transfer(canvas, part)
        return (part,), canvas
    rows = -(-bucket // n_chunks)  # ceil: last chunk may be short
    parts = []
    for r0 in range(0, bucket, rows):
        r1 = min(r0 + rows, bucket)
        if r0 < h:  # rows beyond the image stay stale/zero (masked anyway)
            _pack_rows(arr, cmap, canvas, r0, min(r1, h), w)
        part = jax.device_put(canvas[r0:r1], device)
        if pooled:
            note_canvas_transfer(canvas, part)
        parts.append(part)
    return tuple(parts), canvas


def join_canvas_parts(parts) -> jnp.ndarray:
    """Re-join row chunks from :func:`pack_and_put_canvas` on device."""
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _pack_rows(arr: np.ndarray, cmap, canvas: np.ndarray,
               r0: int, r1: int, w: int) -> None:
    """Channel-map pack arr[r0:r1, :w] -> canvas[r0:r1, :w] (native loop
    when available; both row slices stay C-contiguous)."""
    src, dst, ph = arr[r0:r1], canvas[r0:r1], r1 - r0
    if not hostops.pack_rgb(src, cmap, dst, ph, w):
        dst[:ph, :w, 0] = src[:ph, :, cmap[0]]
        dst[:ph, :w, 1] = src[:ph, :, cmap[1]]
        dst[:ph, :w, 2] = src[:ph, :, cmap[2]]


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
    _pack_rows(arr, cmap, canvas, 0, h, w)
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
