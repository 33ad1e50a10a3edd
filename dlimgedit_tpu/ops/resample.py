"""Dynamic-scale separable resampling as dense matrix products (TPU-native).

The reference resizes on the host CPU with stb (hot loops cited in SURVEY.md
§3.2/§3.3). On TPU, a resize with *runtime-dynamic* sizes but *static* buffer
shapes is expressed as two dense weight-matrix multiplications:

    out[:oh, :ow] = R @ img @ C^T,   R: (OH_bucket, IH), C: (OW_bucket, IW)

where R/C entries are computed on-device from traced scalars (oh, ih) with
broadcasted iota — no gathers, no dynamic shapes, and the heavy lifting is
MXU matmuls. Rows beyond the dynamic output size are zero. This makes every
image size compile to ONE executable per bucket instead of one per shape.

Bilinear weights match torch `interpolate(..., align_corners=False)`
(the SAM/ONNX mask postprocess, segment-anything onnx export) and, with
`antialias=True`, PIL/torchvision antialiased bilinear (the SAM encoder's
ResizeLongestSide upstream semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.common import HIGHEST


def resample_matrix(out_bucket: int, in_bucket: int, out_size, in_size,
                    antialias: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    """Build the (out_bucket, in_bucket) bilinear resampling matrix.

    out_size / in_size may be traced scalars (dynamic); buckets are static.
    Row i (for i < out_size) holds the source weights for output pixel i over
    source pixels [0, in_size); other rows are zero.
    """
    out_size = jnp.asarray(out_size, jnp.float32)
    in_size = jnp.asarray(in_size, jnp.float32)
    i = jax.lax.broadcasted_iota(jnp.float32, (out_bucket, in_bucket), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (out_bucket, in_bucket), 1)
    scale = in_size / out_size
    src = jnp.clip((i + 0.5) * scale - 0.5, 0.0, in_size - 1.0)
    if antialias:
        # Stretch the triangle kernel when minifying (PIL semantics).
        kscale = jnp.minimum(out_size / in_size, 1.0)
    else:
        kscale = jnp.float32(1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - j) * kscale)
    valid = (i < out_size) & (j < in_size)
    w = jnp.where(valid, w, 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(denom > 0, w / jnp.maximum(denom, 1e-20), 0.0)
    return w.astype(dtype)


def apply_resample(R: jnp.ndarray, Cm: jnp.ndarray,
                   img: jnp.ndarray) -> jnp.ndarray:
    """Apply precomputed row/column resample matrices to (H, W, C) float
    data — the ONE copy of the separable double-einsum shared by
    resample_2d, ops/preprocess.sam_preprocess and
    runtime/birefnet._build_birefnet_fn (a resample fix must never be able
    to diverge between the SAM and BiRefNet preprocess programs)."""
    x = jnp.einsum("ih,hwc->iwc", R, img,
                   preferred_element_type=jnp.float32, precision=HIGHEST)
    return jnp.einsum("iwc,jw->ijc", x, Cm,
                      preferred_element_type=jnp.float32, precision=HIGHEST)


def resample_2d(img: jnp.ndarray, out_bucket_h: int, out_bucket_w: int,
                out_h, out_w, in_h, in_w, antialias: bool = False
                ) -> jnp.ndarray:
    """Separable dynamic resize of (H, W, C) or (B, H, W, C) float data.

    The valid region img[:in_h, :in_w] is resized to out[:out_h, :out_w];
    everything outside is zero. Pure matmuls -> MXU."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    B, IH, IW, C = img.shape
    R = resample_matrix(out_bucket_h, IH, out_h, in_h, antialias, img.dtype)
    Cm = resample_matrix(out_bucket_w, IW, out_w, in_w, antialias, img.dtype)
    out = jax.vmap(lambda im: apply_resample(R, Cm, im))(img)
    out = out.astype(img.dtype)
    return out[0] if squeeze else out
