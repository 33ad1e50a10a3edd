"""BiRefNet (lite) — dichotomous foreground segmentation, in pure JAX.

Re-implements the capability the reference runs as birefnet_{cpu,gpu}.onnx
(BiRefNet_lite exports, /root/reference/models/segmentation/CMakeLists.txt:
19-28; pipeline in src/segmentation.cpp:221-270). Architecture follows
BiRefNet (Zheng et al., 2024) at inference:

  Swin-v1-Tiny backbone -> 4-level pyramid [96, 192, 384, 768]
  squeeze block on the deepest level
  top-down decoder: BasicDecBlk chain with 1x1 lateral blocks and bilinear
  upsampling, final 1-channel logit head at input resolution.

Simplifications vs the upstream repo, to be tightened when real checkpoints
can be converted (no network access in this build environment): the
deformable-attention block inside BasicDecBlk (ASPPDeformable) is replaced
by a plain ASPP-lite (parallel dilated convs — deformable sampling has no
efficient TPU lowering), and the training-only branches (gradient
supervision, multi-scale input concat refinement) are omitted.
Output contract matches the reference exactly: logits -> sigmoid -> uint8.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from .common import (
    HIGHEST,
    Params,
    conv2d,
    init_conv,
    init_layer_norm,
    layer_norm,
    relu,
)
from .swin import SWIN_PRESETS, SwinConfig, init_swin, swin_apply


@dataclass(frozen=True)
class BiRefNetConfig:
    img_size: int = 1024
    backbone: str = "swin_v1_tiny"
    dec_inter_channels: int = 64
    aspp_dilations: Tuple[int, ...] = (1, 3, 6)

    @property
    def swin(self) -> SwinConfig:
        return SWIN_PRESETS[self.backbone]

    @property
    def channels(self) -> Tuple[int, ...]:
        # Deepest-first lateral channels, e.g. tiny: (768, 384, 192, 96).
        d = self.swin.embed_dim
        return (8 * d, 4 * d, 2 * d, d)


def _init_conv_bn_block(key, cin, cout, ks, dtype) -> Params:
    return {**init_conv(key, cin, cout, ks, dtype=dtype),
            "scale": jnp.ones((cout,), dtype), "bias": jnp.zeros((cout,), dtype)}


def _apply_conv_bn(p: Params, x, padding=0) -> jnp.ndarray:
    y = conv2d(x, p["w"], padding=padding)
    return y * p["scale"].astype(y.dtype) + p["bias"].astype(y.dtype)


def _init_dec_blk(key, cin, cout, cfg: BiRefNetConfig, dtype) -> Params:
    ks = jax.random.split(key, 3 + len(cfg.aspp_dilations))
    ci = cfg.dec_inter_channels
    return {
        "conv_in": _init_conv_bn_block(ks[0], cin, ci, 3, dtype),
        "aspp": [_init_conv_bn_block(ks[2 + i], ci, ci, 3, dtype)
                 for i in range(len(cfg.aspp_dilations))],
        "aspp_proj": _init_conv_bn_block(ks[1], ci * len(cfg.aspp_dilations),
                                         ci, 1, dtype),
        "conv_out": _init_conv_bn_block(ks[-1], ci, cout, 3, dtype),
    }


def _apply_dec_blk(p: Params, x, cfg: BiRefNetConfig) -> jnp.ndarray:
    x = relu(_apply_conv_bn(p["conv_in"], x, padding=1))
    # ASPP-lite: parallel dilated 3x3 convs, concat, 1x1 project (the TPU
    # stand-in for the upstream ASPPDeformable attention).
    branches = []
    for bp, d in zip(p["aspp"], cfg.aspp_dilations):
        y = jax.lax.conv_general_dilated(
            x, bp["w"].astype(x.dtype), window_strides=(1, 1),
            padding=((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HIGHEST)
        branches.append(relu(y * bp["scale"].astype(y.dtype)
                             + bp["bias"].astype(y.dtype)))
    x = _apply_conv_bn(p["aspp_proj"], jnp.concatenate(branches, axis=-1))
    return _apply_conv_bn(p["conv_out"], x, padding=1)


def init_birefnet(key, cfg: BiRefNetConfig = BiRefNetConfig(),
                  dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 12)
    ch = cfg.channels
    return {
        "backbone": init_swin(ks[0], cfg.swin, dtype),
        "squeeze": _init_dec_blk(ks[1], ch[0], ch[0], cfg, dtype),
        "dec4": _init_dec_blk(ks[2], ch[0], ch[1], cfg, dtype),
        "dec3": _init_dec_blk(ks[3], ch[1], ch[2], cfg, dtype),
        "dec2": _init_dec_blk(ks[4], ch[2], ch[3], cfg, dtype),
        "dec1": _init_dec_blk(ks[5], ch[3], ch[3] // 2, cfg, dtype),
        "lat4": init_conv(ks[6], ch[1], ch[1], 1, dtype=dtype),
        "lat3": init_conv(ks[7], ch[2], ch[2], 1, dtype=dtype),
        "lat2": init_conv(ks[8], ch[3], ch[3], 1, dtype=dtype),
        "head": {**init_conv(ks[9], ch[3] // 2, 1, 1, dtype=dtype),
                 "b": jnp.zeros((1,), dtype)},
    }


def _up2x(x: jnp.ndarray, target_hw) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0],) + tuple(target_hw)
                            + (x.shape[3],), method="bilinear")


def birefnet_apply(params: Params, x: jnp.ndarray,
                   cfg: BiRefNetConfig = BiRefNetConfig()) -> jnp.ndarray:
    """x: (B, S, S, 3) ImageNet-normalised pixels -> (B, S, S, 1) logits."""
    S = x.shape[1]
    x1, x2, x3, x4 = swin_apply(params["backbone"], x, cfg.swin)
    x4 = _apply_dec_blk(params["squeeze"], x4, cfg)

    p4 = _apply_dec_blk(params["dec4"], x4, cfg)           # 1/32, ch[1]
    p4 = _up2x(p4, x3.shape[1:3])
    p3 = p4 + conv2d(x3, params["lat4"]["w"])
    p3 = _apply_dec_blk(params["dec3"], p3, cfg)           # 1/16, ch[2]
    p3 = _up2x(p3, x2.shape[1:3])
    p2 = p3 + conv2d(x2, params["lat3"]["w"])
    p2 = _apply_dec_blk(params["dec2"], p2, cfg)           # 1/8, ch[3]
    p2 = _up2x(p2, x1.shape[1:3])
    p1 = p2 + conv2d(x1, params["lat2"]["w"])
    p1 = _apply_dec_blk(params["dec1"], p1, cfg)           # 1/4, ch[3]//2
    p1 = _up2x(p1, (S, S))
    logits = conv2d(p1, params["head"]["w"]) + params["head"]["b"].astype(p1.dtype)
    return logits.astype(jnp.float32)
