"""Swin Transformer v1 backbone in pure JAX (NHWC, static shapes).

BiRefNet's backbone family (swin_v1_tiny for BiRefNet_lite — the reference's
birefnet_cpu/gpu.onnx models, /root/reference/models/segmentation/
CMakeLists.txt:19-28, are exports of BiRefNet_lite). Standard Swin v1:
patch embed (4x4 conv), stages of [window attention <-> shifted window
attention] blocks with relative-position-bias tables, linear patch merging
between stages. Returns the 4-stage feature pyramid for dense decoders.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    HIGHEST,
    Params,
    conv2d,
    gelu,
    init_layer_norm,
    layer_norm,
    linear,
    linear_init,
    trunc_normal,
)


@dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)


SWIN_PRESETS = {
    "swin_v1_tiny": SwinConfig(),
    "swin_v1_small": SwinConfig(depths=(2, 2, 18, 2)),
    "swin_v1_base": SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                               num_heads=(4, 8, 16, 32)),
    "swin_v1_large": SwinConfig(embed_dim=192, depths=(2, 2, 18, 2),
                                num_heads=(6, 12, 24, 48)),
}


@functools.lru_cache(maxsize=None)
def _rel_pos_index(window: int) -> np.ndarray:
    """Standard Swin relative-position index (w^2, w^2) into the
    ((2w-1)^2,) bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w^2, w^2)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)  # (w^2, w^2)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(pH: int, pW: int, window: int, shift: int) -> np.ndarray:
    """Region mask for shifted-window attention over the padded (pH, pW)
    grid: (num_windows, w^2, w^2) additive mask (0 / -100)."""
    img = np.zeros((pH, pW), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -window), slice(-window, -shift),
                    slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    nH, nW = pH // window, pW // window
    wins = img.reshape(nH, window, nW, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(nH * nW, window * window)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _init_block(key, dim: int, num_heads: int, window: int, mlp_ratio: float,
                dtype) -> Params:
    k = jax.random.split(key, 5)
    n_bias = (2 * window - 1) ** 2
    return {
        "norm1": init_layer_norm(dim, dtype),
        "qkv": {"w": trunc_normal(k[0], (dim, 3 * dim), dtype=dtype),
                "b": jnp.zeros((3 * dim,), dtype)},
        "proj": linear_init(k[1], dim, dim, dtype),
        "rel_bias": trunc_normal(k[2], (n_bias, num_heads), dtype=dtype),
        "norm2": init_layer_norm(dim, dtype),
        "mlp": {"lin1": linear_init(k[3], dim, int(dim * mlp_ratio), dtype),
                "lin2": linear_init(k[4], int(dim * mlp_ratio), dim, dtype)},
    }


def init_swin(key, cfg: SwinConfig = SwinConfig(), dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 10)
    params: Params = {
        "patch_embed": {
            "w": trunc_normal(keys[0], (cfg.patch_size, cfg.patch_size,
                                        cfg.in_chans, cfg.embed_dim),
                              dtype=dtype),
            "b": jnp.zeros((cfg.embed_dim,), dtype),
            "norm": init_layer_norm(cfg.embed_dim, dtype),
        },
        "stages": [],
    }
    for i in range(4):
        dim = cfg.stage_dim(i)
        bkeys = jax.random.split(keys[1 + i], cfg.depths[i] + 2)
        stage: Params = {
            "blocks": [_init_block(bkeys[j], dim, cfg.num_heads[i], cfg.window,
                                   cfg.mlp_ratio, dtype)
                       for j in range(cfg.depths[i])],
            # Per-stage output norm for the feature pyramid (Swin dense heads).
            "out_norm": init_layer_norm(dim, dtype),
        }
        if i < 3:
            stage["downsample"] = {
                "norm": init_layer_norm(4 * dim, dtype),
                "reduction": {"w": trunc_normal(bkeys[-1], (4 * dim, 2 * dim),
                                                dtype=dtype)},
            }
        params["stages"].append(stage)
    return params


def _window_attention(params: Params, x: jnp.ndarray, num_heads: int,
                      window: int, mask: jnp.ndarray | None) -> jnp.ndarray:
    """x: (B, nW, w^2, C); mask: (nW, w^2, w^2) additive or None."""
    B, nW, N, C = x.shape
    hd = C // num_heads
    qkv = linear(params["qkv"], x)
    qkv = qkv.reshape(B, nW, N, 3, num_heads, hd)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    attn = jnp.einsum("bwnhd,bwmhd->bwhnm", q, k,
                      preferred_element_type=jnp.float32,
                      precision=HIGHEST) * (hd ** -0.5)
    idx = _rel_pos_index(window)
    bias = jnp.take(params["rel_bias"], jnp.asarray(idx.ravel()), axis=0)
    bias = bias.reshape(N, N, num_heads).transpose(2, 0, 1)  # (nh, N, N)
    attn = attn + bias.astype(jnp.float32)[None, None]
    if mask is not None:
        attn = attn + mask[None, :, None, :, :]
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bwhnm,bwmhd->bwnhd", attn, v,
                     preferred_element_type=jnp.float32,
                     precision=HIGHEST).astype(v.dtype)
    return linear(params["proj"], out.reshape(B, nW, N, C))


def _swin_block(params: Params, x: jnp.ndarray, num_heads: int, window: int,
                shift: int, eps: float) -> jnp.ndarray:
    B, H, W, C = x.shape
    shortcut = x
    x = layer_norm(params["norm1"], x, eps=eps)
    pad_b = (window - H % window) % window
    pad_r = (window - W % window) % window
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    pH, pW = H + pad_b, W + pad_r
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_attn_mask(pH, pW, window, shift))
    else:
        mask = None
    nH, nW = pH // window, pW // window
    x = x.reshape(B, nH, window, nW, window, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, nH * nW, window * window, C)
    x = _window_attention(params, x, num_heads, window, mask)
    x = x.reshape(B, nH, nW, window, window, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, pH, pW, C)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        x = x[:, :H, :W, :]
    x = shortcut + x
    y = layer_norm(params["norm2"], x, eps=eps)
    y = linear(params["mlp"]["lin2"], gelu(linear(params["mlp"]["lin1"], y)))
    return x + y


def _patch_merge(params: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    B, H, W, C = x.shape
    pad_b, pad_r = H % 2, W % 2
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        H, W = H + pad_b, W + pad_r
    # 4C block order must match torch Swin-v1 PatchMerging's
    # cat([x0, x1, x2, x3]) = (h0w0, h1w0, h0w1, h1w1): w-parity is the
    # outer 2C split and h-parity the inner — checkpoints converted by
    # convert/birefnet.py copy norm/reduction weights verbatim and depend
    # on this layout (see tests/test_birefnet.py patch-merge parity).
    x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 4, 2, 5)
    x = x.reshape(B, H // 2, W // 2, 4 * C)
    x = layer_norm(params["norm"], x, eps=eps)
    return linear(params["reduction"], x)


def swin_apply(params: Params, x: jnp.ndarray,
               cfg: SwinConfig = SwinConfig()) -> List[jnp.ndarray]:
    """x: (B, S, S, 3) -> 4 feature maps at strides 4/8/16/32, each
    layer-normed (the dense-prediction pyramid)."""
    pe = params["patch_embed"]
    x = conv2d(x, pe["w"], stride=cfg.patch_size) + pe["b"].astype(x.dtype)
    x = layer_norm(pe["norm"], x, eps=cfg.layer_norm_eps)
    feats = []
    for i, stage in enumerate(params["stages"]):
        for j, bp in enumerate(stage["blocks"]):
            shift = 0 if j % 2 == 0 else cfg.window // 2
            x = _swin_block(bp, x, cfg.num_heads[i], cfg.window, shift,
                            cfg.layer_norm_eps)
        feats.append(layer_norm(stage["out_norm"], x, eps=cfg.layer_norm_eps))
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x, cfg.layer_norm_eps)
    return feats
