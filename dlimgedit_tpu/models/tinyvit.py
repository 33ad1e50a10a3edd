"""TinyViT-5M image encoder (the MobileSAM `vit_t` encoder) in pure JAX.

This re-implements, TPU-natively (NHWC, bf16-friendly, static shapes), the
architecture that the reference runs as `mobile_sam_image_encoder.onnx`
(/root/reference/src/segmentation.cpp:14,30-46; exported by
/root/reference/script/export_models.py:21-27 from the upstream MobileSAM
`vit_t` checkpoint). Structure follows the TinyViT paper (Wu et al., 2022)
as used by MobileSAM:

  patch_embed (2x conv stride-2, 1024->256)
  stage0: ConvLayer of MBConv blocks @256, merge -> 128
  stage1: window-attention blocks (ws=7)  @128, merge -> 64
  stage2: window-attention blocks (ws=14) @64,  merge -> 64 (stride-1 merge)
  stage3: window-attention blocks (ws=7)  @64
  neck:   1x1 conv -> LN2d -> 3x3 conv -> LN2d, 320 -> 256 channels

Output: (B, 64, 64, 256) image embedding, NHWC (the reference's 1x256x64x64
NCHW embedding, segmentation.cpp:124, transposed to TPU-native layout).

Attention is LeViT-style: learned per-head relative-position attention
biases indexed by a static offset table, LayerNorm folded into the block.
BatchNorms are folded into per-channel affines (see common.init_conv_bn).
"""

from __future__ import annotations

import functools
import itertools
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    HIGHEST,
    Params,
    conv2d,
    conv3x3s2_block,
    conv_bn,
    depth_to_space,
    gelu,
    init_conv,
    init_conv_bn,
    init_layer_norm,
    init_mlp,
    layer_norm,
    linear,
    space_to_depth,
    trunc_normal,
)


@dataclass(frozen=True)
class TinyViTConfig:
    img_size: int = 1024
    in_chans: int = 3
    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3
    neck_dim: int = 256
    # Fused Pallas LayerNorm (ops/fused_norm.py). Measured on v5e @1024:
    # a net LOSS for TinyViT (6.8 -> 8.0 ms; row-padding copies for the
    # 361x49 window layout outweigh the fusion win that holds for big
    # ViTs), so the Environment leaves it off; kept for other geometries.
    use_fused_norm: bool = False
    # Pallas LeViT-bias window attention (ops/flash_attention.py
    # levit_window_attention). Measured on v5e @1024: a net LOSS (5.61 vs
    # 4.81 ms encode — XLA handles these window sizes well), so the
    # Environment leaves it off; kept flag-gated with parity tests.
    use_flash_attention: bool = False
    fused_interpret: bool = False

    @property
    def patch_resolution(self) -> int:
        return self.img_size // 4

    def stage_resolution(self, i: int) -> int:
        # Stage 3 runs at stage 2's resolution (MobileSAM keeps 64x64 for
        # the SAM neck by using a stride-1 patch-merge into the last stage).
        return self.patch_resolution // (2 ** (i if i < 3 else 2))

    @property
    def embedding_resolution(self) -> int:
        return self.stage_resolution(3)


@functools.lru_cache(maxsize=None)
def attention_bias_idxs(window: int) -> Tuple[np.ndarray, int]:
    """Static relative-offset index table for a `window x window` grid.

    Returns (idxs [N, N] int32, num_offsets). Offset enumeration order matches
    the LeViT/TinyViT construction so converted checkpoints line up."""
    points = list(itertools.product(range(window), range(window)))
    offsets: Dict[Tuple[int, int], int] = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.array(idxs, dtype=np.int32).reshape(n, n), len(offsets)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_attention(key, dim: int, num_heads: int, window: int, dtype) -> Params:
    key_dim = dim // num_heads
    d = key_dim  # attn_ratio = 1
    h = (2 * key_dim + d) * num_heads
    k1, k2 = jax.random.split(key)
    _, n_off = attention_bias_idxs(window)
    return {
        "norm": init_layer_norm(dim, dtype),
        "qkv": {"w": trunc_normal(k1, (dim, h), dtype=dtype), "b": jnp.zeros((h,), dtype)},
        "proj": {"w": trunc_normal(k2, (d * num_heads, dim), dtype=dtype),
                 "b": jnp.zeros((dim,), dtype)},
        "attention_biases": jnp.zeros((num_heads, n_off), dtype),
    }


def _init_mbconv(key, dim: int, expand: float, dtype) -> Params:
    hidden = int(dim * expand)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv_bn(k1, dim, hidden, 1, dtype=dtype),
        "conv2": init_conv_bn(k2, hidden, hidden, 3, groups=hidden, dtype=dtype),
        "conv3": init_conv_bn(k3, hidden, dim, 1, bn_weight_init=0.0, dtype=dtype),
    }


def _init_patch_merging(key, dim: int, out_dim: int, dtype) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv_bn(k1, dim, out_dim, 1, dtype=dtype),
        "conv2": init_conv_bn(k2, out_dim, out_dim, 3, groups=out_dim, dtype=dtype),
        "conv3": init_conv_bn(k3, out_dim, out_dim, 1, dtype=dtype),
    }


def _init_block(key, cfg: TinyViTConfig, dim: int, num_heads: int, window: int,
                dtype) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn": _init_attention(k1, dim, num_heads, window, dtype),
        "local_conv": init_conv_bn(k2, dim, dim, cfg.local_conv_size, groups=dim,
                                   dtype=dtype),
        "mlp": init_mlp(k3, dim, int(dim * cfg.mlp_ratio), dtype=dtype),
    }


def init_tiny_vit(key, cfg: TinyViTConfig = TinyViTConfig(),
                  dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 8)
    ed = cfg.embed_dims
    params: Params = {
        "patch_embed": {
            "conv1": init_conv_bn(keys[0], cfg.in_chans, ed[0] // 2, 3, dtype=dtype),
            "conv2": init_conv_bn(keys[1], ed[0] // 2, ed[0], 3, dtype=dtype),
        },
        "stages": [],
    }
    for i in range(4):
        stage_key = jax.random.split(keys[2 + i], cfg.depths[i] + 1)
        if i == 0:
            blocks = [_init_mbconv(stage_key[j], ed[0], cfg.mbconv_expand_ratio, dtype)
                      for j in range(cfg.depths[0])]
        else:
            blocks = [_init_block(stage_key[j], cfg, ed[i], cfg.num_heads[i],
                                  cfg.window_sizes[i], dtype)
                      for j in range(cfg.depths[i])]
        stage: Params = {"blocks": blocks}
        if i < 3:
            stage["downsample"] = _init_patch_merging(stage_key[-1], ed[i], ed[i + 1],
                                                      dtype)
        params["stages"].append(stage)
    kn1, kn2 = jax.random.split(keys[6])
    params["neck"] = {
        "conv1": init_conv(kn1, ed[3], cfg.neck_dim, 1, dtype=dtype),
        "ln1": init_layer_norm(cfg.neck_dim, dtype),
        "conv2": init_conv(kn2, cfg.neck_dim, cfg.neck_dim, 3, dtype=dtype),
        "ln2": init_layer_norm(cfg.neck_dim, dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _ln(params: Params, x: jnp.ndarray, cfg: TinyViTConfig,
        eps: float = 1e-5) -> jnp.ndarray:
    if cfg.use_fused_norm:
        from ..ops.fused_norm import fused_layer_norm

        return fused_layer_norm(x, params["scale"], params["bias"], eps=eps,
                                interpret=cfg.fused_interpret)
    return layer_norm(params, x, eps=eps)


def _attention(params: Params, x: jnp.ndarray, num_heads: int, window: int,
               cfg: TinyViTConfig) -> jnp.ndarray:
    """LeViT-style biased attention over (B, N, C) tokens, N = window**2."""
    B, N, C = x.shape
    key_dim = C // num_heads
    scale = key_dim ** -0.5
    x = _ln(params["norm"], x, cfg)
    qkv = linear(params["qkv"], x)

    idxs, _ = attention_bias_idxs(window)
    bias = jnp.take(params["attention_biases"], jnp.asarray(idxs), axis=1)  # (nh,N,N)

    if cfg.use_flash_attention:
        from ..ops.flash_attention import levit_window_attention

        out = levit_window_attention(qkv, bias, num_heads=num_heads,
                                     interpret=cfg.fused_interpret)
        return linear(params["proj"], out)

    qkv = qkv.reshape(B, N, num_heads, 3 * key_dim)
    q = qkv[..., :key_dim]
    k = qkv[..., key_dim:2 * key_dim]
    v = qkv[..., 2 * key_dim:]
    attn = jnp.einsum("bnhk,bmhk->bhnm", q, k,
                      preferred_element_type=jnp.float32, precision=HIGHEST) * scale
    attn = attn + bias.astype(jnp.float32)[None]
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=jnp.float32, precision=HIGHEST).astype(x.dtype)
    out = out.reshape(B, N, num_heads * key_dim)
    return linear(params["proj"], out)


def _window_partition(x: jnp.ndarray, ws: int):
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C) with bottom/right zero padding."""
    B, H, W, C = x.shape
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    pH, pW = H + pad_b, W + pad_r
    nH, nW = pH // ws, pW // ws
    x = x.reshape(B, nH, ws, nW, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * nH * nW, ws * ws, C), (B, pH, pW, nH, nW, pad_b, pad_r)


def _window_unpartition(x: jnp.ndarray, ws: int, meta, H: int, W: int, C: int):
    B, pH, pW, nH, nW, pad_b, pad_r = meta
    x = x.reshape(B, nH, nW, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, pH, pW, C)
    if pad_b or pad_r:
        x = x[:, :H, :W, :]
    return x


def _mbconv(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    shortcut = x
    hidden = params["conv2"]["scale"].shape[0]
    x = gelu(conv_bn(params["conv1"], x))
    x = gelu(conv_bn(params["conv2"], x, padding=1, groups=hidden))
    x = conv_bn(params["conv3"], x)
    return gelu(x + shortcut)


def _patch_merging(params: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    out_dim = params["conv1"]["scale"].shape[0]
    x = gelu(conv_bn(params["conv1"], x))
    x = gelu(conv_bn(params["conv2"], x, stride=stride, padding=1, groups=out_dim))
    return conv_bn(params["conv3"], x)


def _mlp_ln(params: Params, x: jnp.ndarray, cfg: TinyViTConfig) -> jnp.ndarray:
    y = _ln(params["norm"], x, cfg)
    y = gelu(linear(params["fc1"], y))
    return linear(params["fc2"], y)


def _tiny_vit_block(params: Params, x: jnp.ndarray, num_heads: int, ws: int,
                    cfg: TinyViTConfig) -> jnp.ndarray:
    B, H, W, C = x.shape
    local_conv_size = cfg.local_conv_size
    shortcut = x
    if H == ws and W == ws:
        att = _attention(params["attn"], x.reshape(B, H * W, C), num_heads,
                         ws, cfg)
        att = att.reshape(B, H, W, C)
    else:
        wx, meta = _window_partition(x, ws)
        wx = _attention(params["attn"], wx, num_heads, ws, cfg)
        att = _window_unpartition(wx, ws, meta, H, W, C)
    x = shortcut + att
    x = conv_bn(params["local_conv"], x, padding=local_conv_size // 2, groups=C)
    return x + _mlp_ln(params["mlp"], x, cfg)


def _stem(pe: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Patch embed: two 3x3 stride-2 Conv2d_BNs with a GELU between
    (reference graph: the MobileSAM encoder's PatchEmbed, exported into
    mobile_sam_image_encoder.onnx via script/export_models.py).

    On TPU the C_in=3 first conv is the worst op in the whole encoder under
    XLA's native lowering (~1.15 ms of a 4.8 ms encode @1024, ~2% MFU —
    lane-padded channels; an im2col rewrite measured ~5x worse, see
    common.conv2d_im2col). Instead both convs run as 2x2 block convs over a
    factor-8 space-to-depth grid: conv1's block output layout IS the
    factor-4 space-to-depth of its (H/2, W/2, 32) result, so conv2 consumes
    it directly and only two relayouts exist (one space_to_depth of the
    input, one depth_to_space of the stem output — both ~free). Exact
    reassociation (unit-pinned); measured 1.16 -> 0.49 ms on v5e."""
    B, H, W, _ = x.shape
    c1, c2 = pe["conv1"], pe["conv2"]
    if H % 8 or W % 8:
        y = gelu(conv_bn(c1, x, stride=2, padding=1))
        return conv_bn(c2, y, stride=2, padding=1)
    g1 = 4  # f=8 -> 4x4 output sub-positions per block
    y = conv3x3s2_block(space_to_depth(x, 8), c1["w"], f=8)
    y = y * jnp.tile(c1["scale"], g1 * g1).astype(y.dtype) \
        + jnp.tile(c1["bias"], g1 * g1).astype(y.dtype)
    y = gelu(y)
    # conv2 over the (H/2)-grid at factor 4 == directly on conv1's blocks.
    y = conv3x3s2_block(y, c2["w"], f=4)
    y = depth_to_space(y, 2)
    return y * c2["scale"].astype(y.dtype) + c2["bias"].astype(y.dtype)


def tiny_vit_apply(params: Params, x: jnp.ndarray,
                   cfg: TinyViTConfig = TinyViTConfig()) -> jnp.ndarray:
    """Forward pass. x: (B, img_size, img_size, 3) float (already normalised).
    Returns (B, 64, 64, neck_dim) NHWC embedding."""
    x = _stem(params["patch_embed"], x)

    for i, stage in enumerate(params["stages"]):
        if i == 0:
            for bp in stage["blocks"]:
                x = _mbconv(bp, x)
        else:
            for bp in stage["blocks"]:
                x = _tiny_vit_block(bp, x, cfg.num_heads[i],
                                    cfg.window_sizes[i], cfg)
        if "downsample" in stage:
            # Stride-1 merge into the last stage keeps 64x64 (MobileSAM).
            stride = 1 if cfg.embed_dims[i + 1] in (320, 448, 576) else 2
            x = _patch_merging(stage["downsample"], x, stride)

    neck = params["neck"]
    x = conv2d(x, neck["conv1"]["w"].astype(x.dtype))
    x = _ln(neck["ln1"], x, cfg, eps=1e-6)
    x = conv2d(x, neck["conv2"]["w"].astype(x.dtype), padding=1)
    x = _ln(neck["ln2"], x, cfg, eps=1e-6)
    return x
