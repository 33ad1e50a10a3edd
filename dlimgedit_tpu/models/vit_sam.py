"""SAM ViT image encoders (ViT-B/L/H) in pure JAX — BASELINE configs 3/4.

The reference only ships the MobileSAM (vit_t) encoder
(/root/reference/src/segmentation.cpp:14), but its decoder is the standard
SAM decoder, so the bigger official encoders drop straight in. Architecture:
ViTDet-style plain ViT with decomposed relative-position attention (MViTv2),
windowed attention except at the global-attention blocks, and the same
2-conv LayerNorm2d neck as TinyViT-SAM.

TPU-first: NHWC, windows processed as one big batched matmul, f32 softmax,
bf16-friendly. Static shapes throughout (img_size fixes all token counts).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    HIGHEST,
    Params,
    conv2d,
    gelu,
    init_conv,
    init_layer_norm,
    layer_norm,
    linear,
    linear_init,
    trunc_normal,
)
from .tinyvit import _window_partition, _window_unpartition  # shared helpers


@dataclass(frozen=True)
class SamViTConfig:
    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    neck_dim: int = 256
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    layer_norm_eps: float = 1e-6
    # Use the Pallas flash-attention kernel (ops/flash_attention.py) for the
    # global-attention blocks. Set by the Environment when running on TPU;
    # the dense path remains the CPU/test reference.
    use_flash_attention: bool = False
    # Run the Pallas kernel in interpreter mode (CPU testing only).
    flash_interpret: bool = False
    # Pallas fused LayerNorm (ops/fused_norm.py) vs stock XLA layer_norm.
    # None (default) follows use_flash_attention; a bool overrides (used by
    # the MFU ledger to A/B the in-context cost of the two lowerings).
    fused_layer_norm: bool | None = None
    # Round-2 experiment: slice windows via BlockSpec inside the kernel
    # (skips the physical 6D partition transposes, ~20 ms/ViT-H in profiles).
    fused_window_blocks: bool = False

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


VIT_PRESETS = {
    "vit_b": lambda img_size=1024: SamViTConfig(
        img_size=img_size, embed_dim=768, depth=12, num_heads=12,
        global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": lambda img_size=1024: SamViTConfig(
        img_size=img_size, embed_dim=1024, depth=24, num_heads=16,
        global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": lambda img_size=1024: SamViTConfig(
        img_size=img_size, embed_dim=1280, depth=32, num_heads=16,
        global_attn_indexes=(7, 15, 23, 31)),
}


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_block(key, cfg: SamViTConfig, window: int, dtype) -> Params:
    d = cfg.embed_dim
    hd = d // cfg.num_heads
    size = cfg.grid if window == 0 else window
    k = jax.random.split(key, 4)
    p: Params = {
        "norm1": init_layer_norm(d, dtype),
        "qkv": {"w": trunc_normal(k[0], (d, 3 * d), dtype=dtype),
                "b": jnp.zeros((3 * d,), dtype)},
        "proj": linear_init(k[1], d, d, dtype),
        "norm2": init_layer_norm(d, dtype),
        "mlp": {"lin1": linear_init(k[2], d, int(d * cfg.mlp_ratio), dtype),
                "lin2": linear_init(k[3], int(d * cfg.mlp_ratio), d, dtype)},
    }
    if cfg.use_rel_pos:
        p["rel_pos_h"] = jnp.zeros((2 * size - 1, hd), dtype)
        p["rel_pos_w"] = jnp.zeros((2 * size - 1, hd), dtype)
    return p


def init_sam_vit(key, cfg: SamViTConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.depth + 4)
    params: Params = {
        "patch_embed": {
            "w": trunc_normal(ks[0],
                              (cfg.patch_size, cfg.patch_size, cfg.in_chans,
                               cfg.embed_dim), dtype=dtype),
            "b": jnp.zeros((cfg.embed_dim,), dtype),
        },
        "blocks": [
            _init_block(ks[1 + i], cfg,
                        0 if i in cfg.global_attn_indexes else cfg.window_size,
                        dtype)
            for i in range(cfg.depth)
        ],
        "neck": {
            "conv1": init_conv(ks[-2], cfg.embed_dim, cfg.neck_dim, 1, dtype=dtype),
            "ln1": init_layer_norm(cfg.neck_dim, dtype),
            "conv2": init_conv(ks[-1], cfg.neck_dim, cfg.neck_dim, 3, dtype=dtype),
            "ln2": init_layer_norm(cfg.neck_dim, dtype),
        },
    }
    if cfg.use_abs_pos:
        params["pos_embed"] = jnp.zeros((1, cfg.grid, cfg.grid, cfg.embed_dim), dtype)
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def gather_rel_pos(table: jnp.ndarray, size: int) -> jnp.ndarray:
    """(2*size-1, hd) raw rel-pos table -> gathered (size, size, hd) with
    g[i, j] = table[i - j + size - 1] (equal q/k sizes). The ONE copy of the
    index-table gather used by every attention path in this file (dense,
    Pallas, fused-window) — ops/flash_attention._gathered_tables mirrors it
    for callers passing raw tables."""
    idx = np.arange(size)[:, None] - np.arange(size)[None, :] + (size - 1)
    return jnp.take(table, jnp.asarray(idx), axis=0)


def _decomposed_rel_pos_bias(q: jnp.ndarray, rel_pos_h: jnp.ndarray,
                             rel_pos_w: jnp.ndarray, h: int, w: int
                             ) -> jnp.ndarray:
    """MViTv2 decomposed relative position bias for equal q/k sizes.

    q: (B*, nh, h*w, hd). rel_pos_*: (2*size-1, hd) with size == h (== w).
    Returns bias (B*, nh, h*w, h*w)."""
    rh = gather_rel_pos(rel_pos_h, h)  # (h, h, hd)
    rw = gather_rel_pos(rel_pos_w, w)  # (w, w, hd)
    Bn, nh, _, hd = q.shape
    qr = q.reshape(Bn, nh, h, w, hd)
    bias_h = jnp.einsum("bnhwc,hkc->bnhwk", qr, rh.astype(q.dtype),
                        preferred_element_type=jnp.float32, precision=HIGHEST)
    bias_w = jnp.einsum("bnhwc,wkc->bnhwk", qr, rw.astype(q.dtype),
                        preferred_element_type=jnp.float32, precision=HIGHEST)
    bias = bias_h[..., :, None] + bias_w[..., None, :]  # (B,nh,h,w,h,w)
    return bias.reshape(Bn, nh, h * w, h * w)


def _vit_attention(params: Params, x: jnp.ndarray, num_heads: int,
                   use_rel_pos: bool, use_flash: bool = False,
                   flash_interpret: bool = False, apply_proj: bool = True,
                   n_w: int | None = None,
                   valid_rows: int | None = None) -> jnp.ndarray:
    """x: (B*, h, w, C) -> same shape (channels 3C/... see apply_proj).

    apply_proj=False returns the pre-projection attention output so the
    windowed caller can apply `proj` AFTER unpartition-crop (per-token op;
    skips the 16% pad-token rows of the padded grid — exact).
    n_w/valid_rows: bottom-window pad-query skip, forwarded to the Pallas
    path (ops/flash_attention._attention_head_fused)."""
    Bn, h, w, C = x.shape
    hd = C // num_heads
    qkv = linear(params["qkv"], x.reshape(Bn, h * w, C))
    qkv = qkv.reshape(Bn, h * w, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # (Bn, nh, hw, hd)

    if use_flash and use_rel_pos:
        # Pallas kernel: bias reconstructed in-tile, nothing quadratic in HBM.
        from ..ops.flash_attention import flash_attention_relpos

        rh = gather_rel_pos(params["rel_pos_h"], h)
        rw = gather_rel_pos(params["rel_pos_w"], w)
        out = flash_attention_relpos(
            q.reshape(Bn * num_heads, h * w, hd),
            k.reshape(Bn * num_heads, h * w, hd),
            v.reshape(Bn * num_heads, h * w, hd),
            rh.astype(q.dtype), rw.astype(q.dtype), grid_h=h, grid_w=w,
            heads=num_heads, interpret=flash_interpret,
            n_w=n_w, valid_rows=valid_rows)
        out = out.reshape(Bn, num_heads, h * w, hd)
    else:
        attn = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                          preferred_element_type=jnp.float32,
                          precision=HIGHEST) * (hd ** -0.5)
        if use_rel_pos:
            attn = attn + _decomposed_rel_pos_bias(q, params["rel_pos_h"],
                                                   params["rel_pos_w"], h, w)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v,
                         preferred_element_type=jnp.float32,
                         precision=HIGHEST).astype(v.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(Bn, h, w, C)
    if not apply_proj:
        return out
    return linear(params["proj"], out)


def _layer_norm(params: Params, x: jnp.ndarray, cfg: SamViTConfig
                ) -> jnp.ndarray:
    if _use_fused_ln(cfg):  # TPU fused-kernel mode
        from ..ops.fused_norm import fused_layer_norm

        return fused_layer_norm(x, params["scale"], params["bias"],
                                eps=cfg.layer_norm_eps,
                                interpret=cfg.flash_interpret)
    return layer_norm(params, x, eps=cfg.layer_norm_eps)


def _use_fused_ln(cfg: SamViTConfig) -> bool:
    return (cfg.use_flash_attention if cfg.fused_layer_norm is None
            else cfg.fused_layer_norm)


def _vit_block_carry(params: Params, base: jnp.ndarray,
                     delta, cfg: SamViTConfig, window: int):
    """One transformer block in residual-carry form.

    Takes the residual stream as (base, delta) with x = base + delta
    (delta None for the first block) and returns (h, mlp_out) with the
    block output = h + mlp_out. This lets BOTH residual adds fuse into
    the Pallas LayerNorm kernel (ops/fused_norm.fused_add_layer_norm):
    the unfused add's output otherwise round-trips HBM before the
    (opaque-to-XLA-fusion) LN kernel reads it back — one full activation
    pass saved per LN, bit-matching the unfused chain."""
    fused = _use_fused_ln(cfg)
    if delta is None:
        x = base
        y1 = _layer_norm(params["norm1"], x, cfg)
    elif fused:
        from ..ops.fused_norm import fused_add_layer_norm

        x, y1 = fused_add_layer_norm(
            base, delta, params["norm1"]["scale"], params["norm1"]["bias"],
            eps=cfg.layer_norm_eps, interpret=cfg.flash_interpret)
    else:
        x = base + delta
        y1 = _layer_norm(params["norm1"], x, cfg)
    a = _vit_attn_branch(params, y1, cfg, window)
    if fused:
        from ..ops.fused_norm import fused_add_layer_norm

        h, y2 = fused_add_layer_norm(
            x, a, params["norm2"]["scale"], params["norm2"]["bias"],
            eps=cfg.layer_norm_eps, interpret=cfg.flash_interpret)
    else:
        h = x + a
        y2 = _layer_norm(params["norm2"], h, cfg)
    m = linear(params["mlp"]["lin2"], gelu(linear(params["mlp"]["lin1"], y2)))
    return h, m


def _vit_attn_branch(params: Params, x: jnp.ndarray, cfg: SamViTConfig,
                     window: int) -> jnp.ndarray:
    """The attention half-block applied to the already-normed x."""
    B, H, W, C = x.shape
    if window > 0 and cfg.fused_window_blocks and cfg.use_rel_pos:
        # Kernel-sliced windows: no physical partition/head transposes.
        from ..ops.flash_attention import windowed_attention_fused

        # Pad x BEFORE the qkv projection (as the dense path does): pad
        # tokens must have k/v equal to the qkv bias, not zero, or valid
        # queries in edge windows see spurious zero keys under real
        # checkpoints (the bias is nonzero there).
        pad_b = (window - H % window) % window
        pad_r = (window - W % window) % window
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        qkv = linear(params["qkv"], x)  # (B, H+pad, W+pad, 3C)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rh = gather_rel_pos(params["rel_pos_h"], window)
        rw = gather_rel_pos(params["rel_pos_w"], window)
        att = windowed_attention_fused(q, k, v, rh.astype(q.dtype),
                                       rw.astype(q.dtype), ws=window,
                                       num_heads=cfg.num_heads,
                                       interpret=cfg.flash_interpret)
        x = linear(params["proj"], att[:, :H, :W, :])
    elif window > 0:
        wx, meta = _window_partition(x, window)
        _, _, _, _, nW, pad_b, _ = meta
        wx = wx.reshape(-1, window, window, C)
        # Pad-query skip (Pallas path, batch 1 only: the bottom windows
        # must be the contiguous tail of the window axis) + proj after the
        # unpartition crop (per-token matmul on 4096 instead of 4900
        # tokens) — both exact; pad KEYS still participate per SAM
        # semantics, only the discarded pad-query rows are skipped.
        skip_ok = B == 1 and pad_b > 0
        wx = _vit_attention(params, wx, cfg.num_heads, cfg.use_rel_pos,
                            use_flash=cfg.use_flash_attention,
                            flash_interpret=cfg.flash_interpret,
                            apply_proj=False,
                            n_w=nW if skip_ok else None,
                            valid_rows=window - pad_b if skip_ok else None)
        x = _window_unpartition(wx.reshape(-1, window * window, C), window, meta,
                                H, W, C)
        x = linear(params["proj"], x)
    else:
        x = _vit_attention(params, x, cfg.num_heads, cfg.use_rel_pos,
                           use_flash=cfg.use_flash_attention,
                           flash_interpret=cfg.flash_interpret)
    return x


def _vit_block(params: Params, x: jnp.ndarray, cfg: SamViTConfig, window: int
               ) -> jnp.ndarray:
    """Single-block form (tests / prefix benchmarks); sam_vit_apply uses
    the carry form so the inter-block residual add also fuses."""
    h, m = _vit_block_carry(params, x, None, cfg, window)
    return h + m


def _patch_embed(pe: Params, x: jnp.ndarray, P: int) -> jnp.ndarray:
    """Non-overlapping patch embed as space-to-depth + ONE matmul.

    Mathematically identical to conv2d(x, w, stride=P) for a P x P / s=P
    kernel, but the conv lowering from 3 input channels measured 2.7% MFU
    on v5e (1.51 ms of ViT-H; MFU ledger round 3) — the reshaped
    (N, P*P*3) @ (P*P*3, C) form runs the same FLOPs as a full-tile MXU
    matmul. The HWIO kernel reshape (P, P, 3, C) -> (P*P*3, C) matches the
    (py, px, c) order of the space-to-depth output."""
    B, S, _, c_in = x.shape
    g = S // P
    C = pe["w"].shape[-1]
    xp = x.reshape(B, g, P, g, P, c_in).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(B, g, g, P * P * c_in)
    w = pe["w"].astype(x.dtype).reshape(P * P * c_in, C)
    prec = (HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jnp.einsum("bhwk,kc->bhwc", xp, w,
                   preferred_element_type=jnp.float32,
                   precision=prec).astype(x.dtype)
    return y + pe["b"].astype(x.dtype)


def sam_vit_apply(params: Params, x: jnp.ndarray, cfg: SamViTConfig
                  ) -> jnp.ndarray:
    """x: (B, S, S, 3) normalised pixels -> (B, S/16, S/16, neck_dim)."""
    x = _patch_embed(params["patch_embed"], x, cfg.patch_size)
    if cfg.use_abs_pos and "pos_embed" in params:
        x = x + params["pos_embed"].astype(x.dtype)
    # Residual-carry chain: block i's output add is deferred into block
    # i+1's fused add+LN (see _vit_block_carry).
    delta = None
    for i, bp in enumerate(params["blocks"]):
        window = 0 if i in cfg.global_attn_indexes else cfg.window_size
        x, delta = _vit_block_carry(bp, x, delta, cfg, window)
    if delta is not None:
        x = x + delta
    neck = params["neck"]
    x = conv2d(x, neck["conv1"]["w"].astype(x.dtype))
    x = layer_norm(neck["ln1"], x, eps=1e-6)
    x = conv2d(x, neck["conv2"]["w"].astype(x.dtype), padding=1)
    x = layer_norm(neck["ln2"], x, eps=1e-6)
    return x
