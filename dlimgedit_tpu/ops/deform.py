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

import os

import jax.numpy as jnp
from jax import lax

from ..models.common import HIGHEST

# Spatial band size for the tap loop: the largest extent the XLA TPU
# backend still fuses the gather -> lerp -> modulate -> matmul pipeline
# for.  At 512x512 (high_res dec1) the same graph de-fuses and
# materialises the per-tap intermediates — the @2048 ledger measured the
# k1 branch at 97% of its *unfused* byte floor (4.2 GB accessed) while
# the identical @1024-shape branch exceeds its estimate 1.6x (fused).
# Banding the OUTPUT rows restores the fusing shape exactly; the corner
# stack table stays whole (samples reach anywhere), so the math is
# unchanged per element. Pinned by
# tests/test_ops.py::test_deform_banding_matches_unbanded.
# Env override for on-chip tuning.  Default from the round-4 on-chip
# band-size sweep (BENCH_NOTES): 16384 is the minimum at BOTH
# resolutions — full BiRefNet 64.4 ms @1024 (65536: 71.9) and 384.7 ms
# @2048 (65536: 404.7); 8192 starts paying per-band overhead again.
_BAND_PIXELS = int(os.environ.get("DLIMG_DEFORM_BAND_PIXELS", "16384"))
# 2-D banding experiment (round-5, VERDICT r4 #8): additionally split each
# row band into column tiles, shrinking the per-step gather working set
# (rows y..y+hb of the corner stack are re-fetched once per tile edge
# instead of streamed full-width) to probe the residual 1.5x tap-reuse
# headroom @2048.  1 = off (the shipped configuration; see BENCH_NOTES
# round-5 for the on-chip verdict).  Taps may reach across tile borders —
# the corner-stack table stays whole, so the math is exact for any tiling
# (pinned by tests/test_ops.py::test_deform_2d_banding_matches_unbanded).
_COL_TILES = int(os.environ.get("DLIMG_DEFORM_COL_TILES", "1"))


def _bilinear_sample(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample x (B, H, W, C) at float positions (py, px) (B, H', W') with
    bilinear interpolation; taps outside the image contribute zero (the
    torchvision deform_conv2d boundary rule). Reference form (4 gathers);
    kept as the in-repo oracle for `_corner_stack` +
    `_bilinear_sample_stacked`, which the conv uses (TPU row-gathers are
    launch-bound, so one gather of 4C-wide rows beats four gathers of
    C-wide rows ~4x). The two forms are pinned equal by
    tests/test_ops.py::test_stacked_bilinear_matches_reference_form."""
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


def _corner_stack(x: jnp.ndarray, int8: bool = False):
    """Precompute the 4-corner map for stacked bilinear sampling.

    Pads x by (1 top/left, 2 bottom/right) with zeros and concatenates the
    four 2x2-corner shifts on the channel axis, so ONE row-gather at
    flattened index (y0+1, x0+1) fetches all four bilinear corners, with
    out-of-image corners reading genuine zeros (the torchvision boundary
    rule) for any y0 in [-1, H], x0 in [-1, W].

    ``int8=True`` additionally quantises the stack symmetrically (scale =
    max|x| / 127, computed on device) — the K-tap gather loop is at the
    measured TPU gather-bandwidth floor (~50-100 GB/s; BENCH_NOTES), so
    halving the bytes per fetched row nearly halves deform-conv time at the
    cost of a bounded sampling approximation (opt-in via
    Options.birefnet_int8_deform)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    Hp, Wp = H + 3, W + 3
    stack = jnp.concatenate([
        xp[:, :-1, :-1, :],   # corner (y0,   x0  )
        xp[:, :-1, 1:, :],    # corner (y0,   x0+1)
        xp[:, 1:, :-1, :],    # corner (y0+1, x0  )
        xp[:, 1:, 1:, :],     # corner (y0+1, x0+1)
    ], axis=-1)               # (B, Hp-1, Wp-1, 4C)
    stack = stack.reshape(B, (Hp - 1) * (Wp - 1), 4 * C)
    scale = None
    if int8:
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(absmax, 1e-12) / 127.0
        stack = jnp.clip(jnp.round(stack.astype(jnp.float32) / scale),
                         -127, 127).astype(jnp.int8)
    return stack, (H, W, Wp - 1), scale


def _bilinear_sample_stacked(stack_info, py: jnp.ndarray, px: jnp.ndarray,
                             C: int, dtype) -> jnp.ndarray:
    """Bilinear sample using a `_corner_stack` map: one gather per tap."""
    stack, (H, W, Ws), scale = stack_info
    B = stack.shape[0]
    oh, ow = py.shape[-2:]
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]
    # Zero iff the 2x2 cell misses the image entirely; inside that range the
    # padded stack already returns exact zeros for out-of-image corners.
    box = ((py > -1.0) & (py < H) & (px > -1.0) & (px < W))
    yc = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
    xc = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
    idx = (yc * Ws + xc).reshape(B, oh * ow, 1)
    v4 = jnp.take_along_axis(stack, idx, axis=1).reshape(B, oh, ow, 4, C)
    if scale is not None:  # int8 stack: dequantise after the gather
        v4 = v4.astype(jnp.float32) * scale
    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    out = (v4[..., 0, :] * w00 + v4[..., 1, :] * w01
           + v4[..., 2, :] * w10 + v4[..., 3, :] * w11)
    return (out * box[..., None].astype(out.dtype)).astype(dtype)


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                  w: jnp.ndarray, bias: jnp.ndarray | None = None,
                  padding: int = 0, int8_gather: bool = False) -> jnp.ndarray:
    """Modulated deformable conv, stride 1 / dilation 1 / 1 offset group.

    x:      (B, H, W, C)
    offset: (B, H, W, 2K), interleaved (dy, dx) per kernel tap k = ky*kw + kx
            (torchvision channel layout, converted to channels-last)
    mask:   (B, H, W, K) modulation (already through 2*sigmoid in the caller)
    w:      (kh, kw, C, Cout) HWIO
    bias:   (Cout,) or None
    int8_gather: gather from an int8-quantised corner stack (half the bytes
            through the gather-bandwidth floor; bounded approximation —
            see _corner_stack)
    """
    B, H, W, C = x.shape
    kh, kw, _, cout = w.shape
    stack_info = _corner_stack(x, int8=int8_gather)  # shared by every tap
    wmat = w.astype(jnp.float32)

    def taps_over(offset_b, mask_b, y_base, x_base=jnp.int32(0)):
        """All K taps over one output tile starting at absolute row y_base
        / column x_base; the band shape is what XLA's fusion heuristics
        keep fused (see _BAND_PIXELS / _COL_TILES)."""
        hb, wb = offset_b.shape[1], offset_b.shape[2]
        ys = (y_base + jnp.arange(hb, dtype=jnp.int32)
              ).astype(offset_b.dtype)[:, None]
        xs = (x_base + jnp.arange(wb, dtype=jnp.int32)
              ).astype(offset_b.dtype)[None, :]
        acc = jnp.zeros((B, hb, wb, cout), jnp.float32)
        for ky in range(kh):
            for kx in range(kw):
                k = ky * kw + kx
                py = ys + (ky - padding) + offset_b[..., 2 * k]
                px = xs + (kx - padding) + offset_b[..., 2 * k + 1]
                val = _bilinear_sample_stacked(
                    stack_info, py, px, C,
                    jnp.float32) * mask_b[..., k:k + 1]
                acc = acc + jnp.einsum(
                    "bhwc,co->bhwo", val, wmat[ky, kx],
                    preferred_element_type=jnp.float32, precision=HIGHEST)
        return acc

    n_bands = max(1, (H * W) // _BAND_PIXELS)
    while H % n_bands:
        n_bands -= 1
    nt = _COL_TILES if (_COL_TILES > 1 and W % _COL_TILES == 0) else 1
    if n_bands > 1 or nt > 1:
        hb = H // n_bands
        wt = W // nt
        k2, km = offset.shape[-1], mask.shape[-1]
        off_b = offset.reshape(B, n_bands, hb, nt, wt, k2).transpose(
            1, 3, 0, 2, 4, 5).reshape(n_bands * nt, B, hb, wt, k2)
        msk_b = mask.reshape(B, n_bands, hb, nt, wt, km).transpose(
            1, 3, 0, 2, 4, 5).reshape(n_bands * nt, B, hb, wt, km)
        ybases = jnp.repeat(jnp.arange(n_bands, dtype=jnp.int32) * hb, nt)
        xbases = jnp.tile(jnp.arange(nt, dtype=jnp.int32) * wt, n_bands)

        def scan_body(_, xs_in):
            ob, mb, yb, xb = xs_in
            return None, taps_over(ob, mb, yb, xb)

        _, tiles = lax.scan(scan_body, None, (off_b, msk_b, ybases, xbases))
        out = tiles.reshape(n_bands, nt, B, hb, wt, cout).transpose(
            2, 0, 3, 1, 4, 5).reshape(B, H, W, cout)
    else:
        out = taps_over(offset, mask, jnp.int32(0))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(x.dtype)
