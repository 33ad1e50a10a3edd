"""Fused SAM mask postprocessing — low-res logits to a full-resolution
binary mask in one XLA program.

Mirrors the ONNX decoder's in-graph `mask_postprocessing`
(consumed by the reference at /root/reference/src/segmentation.cpp:158-173):
  1. bilinear 256 -> 1024 (model input space)
  2. crop to the pre-padded size (resize-longest-side extent)
  3. bilinear to the original image size
  4. threshold logits > 0 -> 0/255 (write_mask_image, segmentation.cpp:108-116)

Steps 1-3 are linear, so they compose into a SINGLE pair of resampling
matrices (bucket x 256): the whole postprocess is two matmuls + a compare,
with static shapes for any original size up to the bucket.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.common import HIGHEST
from .resample import resample_matrix


def _composed_axis_matrix(bucket: int, low: int, model_size: int, orig, crop
                          ) -> jnp.ndarray:
    """(bucket, low) matrix == resize(crop(resize(low->model_size))->orig).

    `orig` (original image size along this axis) and `crop` (pre-padded size,
    = round(orig * model_size / longest)) are traced scalars."""
    # Static stage-1: low -> model_size upsample (torch bilinear,
    # align_corners=False), as a constant matrix.
    up = resample_matrix(model_size, low, model_size, low, antialias=False)
    # Dynamic stage-2: rows sample the cropped region [0, crop) of the
    # model_size axis and map it onto [0, orig).
    down = resample_matrix(bucket, model_size, orig, crop, antialias=False)
    return jnp.dot(down, up, preferred_element_type=jnp.float32,
                   precision=HIGHEST)


def upsample_mask_logits(low_res: jnp.ndarray, bucket: int, model_size: int,
                         orig_h, orig_w, crop_h, crop_w) -> jnp.ndarray:
    """low_res: (B, T, L, L) logits -> (B, T, bucket, bucket) logits at the
    original resolution (valid region [:orig_h, :orig_w], rest zero)."""
    L = low_res.shape[-1]
    R = _composed_axis_matrix(bucket, L, model_size, orig_h, crop_h)
    C = _composed_axis_matrix(bucket, L, model_size, orig_w, crop_w)
    x = jnp.einsum("ih,bthw->btiw", R, low_res.astype(jnp.float32),
                   preferred_element_type=jnp.float32, precision=HIGHEST)
    return jnp.einsum("btiw,jw->btij", x, C,
                      preferred_element_type=jnp.float32, precision=HIGHEST)


def threshold_mask(logits: jnp.ndarray) -> jnp.ndarray:
    """logits > 0 -> uint8 {0, 255} (write_mask_image semantics)."""
    return jnp.where(logits > 0, jnp.uint8(255), jnp.uint8(0))


def pack_mask_bits(logits: jnp.ndarray) -> jnp.ndarray:
    """Threshold logits and pack 8 pixels/byte along the last axis (MSB
    first, np.unpackbits order): (..., W) -> (..., W//8) uint8.

    Device-side compression of the D2H mask payload — on remote-attached
    TPUs the fetch RPC cost scales with payload size, so shipping bits
    instead of bytes cuts the 1 MB @1024^2 canvas to 128 KB. W must be a
    multiple of 8 (canvas buckets are powers of two)."""
    bits = (logits > 0).astype(jnp.uint8)
    *lead, w = bits.shape
    assert w % 8 == 0, f"width {w} not a multiple of 8"
    bits = bits.reshape(*lead, w // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (bits * weights).sum(axis=-1).astype(jnp.uint8)


def unpack_mask_bits(packed: "np.ndarray", width: int) -> "np.ndarray":
    """Host inverse of pack_mask_bits: (..., W//8) u8 -> (..., W) u8 {0,255}."""
    import numpy as np

    bits = np.unpackbits(packed, axis=-1, count=width)
    return bits * np.uint8(255)


def sigmoid_to_u8(logits: jnp.ndarray) -> jnp.ndarray:
    """BiRefNet postprocess: uint8(sigmoid(x) * 255), truncation like the
    reference's C cast (segmentation.cpp:258-270)."""
    v = jax.nn.sigmoid(logits.astype(jnp.float32)) * 255.0
    return jnp.floor(v).astype(jnp.uint8)
