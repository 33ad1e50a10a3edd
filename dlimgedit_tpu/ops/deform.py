"""Modulated deformable convolution v2 (NHWC), numerically matching
torchvision.ops.deform_conv2d — the op inside BiRefNet's ASPPDeformable
(upstream models/modules/deform_conv.py; the reference consumes it opaquely
inside birefnet_*.onnx, /root/reference/models/segmentation/CMakeLists.txt:
19-28).

TPU-first design: instead of the CUDA im2col-with-pointer-chasing lowering,
the kernel-position loop accumulates `K` (<= 49) steps of
  bilinear-gather (VPU/scatter-gather) -> modulate -> 1x1 matmul (MXU),
so all FLOPs land on the MXU and the sampled activations are never
materialised as a (H, W, K, C) tensor. Stride 1, dilation 1, one offset
group — the only configuration BiRefNet uses.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.common import HIGHEST


def _bilinear_sample(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample x (B, H, W, C) at float positions (py, px) (B, H', W') with
    bilinear interpolation; taps outside the image contribute zero (the
    torchvision deform_conv2d boundary rule)."""
    B, H, W, C = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]
    flat = x.reshape(B, H * W, C)
    oh, ow = py.shape[-2:]

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(B, oh * ow, 1)
        v = jnp.take_along_axis(flat, idx, axis=1).reshape(B, oh, ow, C)
        return v * inb[..., None].astype(v.dtype)

    return (tap(y0, x0) * (1 - wy) * (1 - wx)
            + tap(y0, x0 + 1) * (1 - wy) * wx
            + tap(y0 + 1, x0) * wy * (1 - wx)
            + tap(y0 + 1, x0 + 1) * wy * wx)


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  w: jnp.ndarray, bias: jnp.ndarray | None = None,
                  padding: int = 0) -> jnp.ndarray:
    """Modulated deformable conv, stride 1 / dilation 1 / 1 offset group.

    x:      (B, H, W, C)
    offset: (B, H, W, 2K), interleaved (dy, dx) per kernel tap k = ky*kw + kx
            (torchvision channel layout, converted to channels-last)
    mask:   (B, H, W, K) modulation (already through 2*sigmoid in the caller)
    w:      (kh, kw, C, Cout) HWIO
    bias:   (Cout,) or None
    """
    B, H, W, C = x.shape
    kh, kw, _, cout = w.shape
    ys = jnp.arange(H, dtype=offset.dtype)[:, None]
    xs = jnp.arange(W, dtype=offset.dtype)[None, :]
    out = jnp.zeros((B, H, W, cout), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            k = ky * kw + kx
            py = ys + (ky - padding) + offset[..., 2 * k]
            px = xs + (kx - padding) + offset[..., 2 * k + 1]
            val = _bilinear_sample(x, py, px) * mask[..., k:k + 1]
            out = out + jnp.einsum(
                "bhwc,co->bhwo", val, w[ky, kx].astype(val.dtype),
                preferred_element_type=jnp.float32, precision=HIGHEST)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
