"""SAM mask decoder (two-way transformer + hypernetwork heads) in pure JAX.

Re-implements the decoder the reference runs as `sam_mask_decoder_*.onnx`
(/root/reference/src/segmentation.cpp:19-24,154-173): a 2-layer two-way
transformer over [iou_token, 4 mask tokens, sparse prompts] x image
embedding, a 4x transposed-conv upscaler to 256x256, per-token hypernetwork
MLPs, and the IoU prediction head. "Single-mask" selection follows the ONNX
export's `select_masks` (argmax IoU over tokens 1..3 when two prompt points
are given); the multi-mask path returns all 4 (the reference consumes
indices 1..3, segmentation.cpp:166-173).

TPU-first choices: NHWC everywhere, f32 attention softmax, batched token
matmuls sized for the MXU; no dynamic shapes.
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
    conv_transpose2d,
    gelu,
    init_layer_norm,
    layer_norm,
    linear,
    linear_init,
    relu,
)


@dataclass(frozen=True)
class MaskDecoderConfig:
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    depth: int = 2
    attention_downsample_rate: int = 2
    num_mask_tokens: int = 4  # 1 + num_multimask_outputs(3)
    iou_head_depth: int = 3
    iou_head_hidden: int = 256


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_attn(key, embed_dim, internal_dim, dtype) -> Params:
    k = jax.random.split(key, 4)
    return {
        "q": linear_init(k[0], embed_dim, internal_dim, dtype),
        "k": linear_init(k[1], embed_dim, internal_dim, dtype),
        "v": linear_init(k[2], embed_dim, internal_dim, dtype),
        "out": linear_init(k[3], internal_dim, embed_dim, dtype),
    }


def _init_twoway_block(key, cfg: MaskDecoderConfig, dtype) -> Params:
    ed = cfg.embed_dim
    down = ed // cfg.attention_downsample_rate
    k = jax.random.split(key, 6)
    km = jax.random.split(k[5], 2)
    return {
        "self_attn": _init_attn(k[0], ed, ed, dtype),
        "norm1": init_layer_norm(ed, dtype),
        "cross_attn_t2i": _init_attn(k[1], ed, down, dtype),
        "norm2": init_layer_norm(ed, dtype),
        "mlp": {"lin1": linear_init(km[0], ed, cfg.mlp_dim, dtype),
                "lin2": linear_init(km[1], cfg.mlp_dim, ed, dtype)},
        "norm3": init_layer_norm(ed, dtype),
        "norm4": init_layer_norm(ed, dtype),
        "cross_attn_i2t": _init_attn(k[2], ed, down, dtype),
    }


def _init_mlp_chain(key, dims, dtype) -> Params:
    ks = jax.random.split(key, len(dims) - 1)
    return {"layers": [linear_init(ks[i], dims[i], dims[i + 1], dtype)
                       for i in range(len(dims) - 1)]}


def init_mask_decoder(key, cfg: MaskDecoderConfig = MaskDecoderConfig(),
                      dtype=jnp.float32) -> Params:
    ed = cfg.embed_dim
    ks = jax.random.split(key, 10)
    # Blocks draw from a dedicated split: indexing ks[i] directly would
    # collide with the token/upscale/hypernet keys below for depth > 2.
    bks = jax.random.split(ks[0], cfg.depth)
    blocks = [_init_twoway_block(bks[i], cfg, dtype) for i in range(cfg.depth)]
    kups = jax.random.split(ks[4], 2)
    nmt = cfg.num_mask_tokens
    khyp = jax.random.split(ks[5], nmt)
    return {
        "iou_token": jax.random.normal(ks[2], (1, ed), dtype),
        "mask_tokens": jax.random.normal(ks[3], (nmt, ed), dtype),
        "transformer": {
            "blocks": blocks,
            "final_attn": _init_attn(ks[6], ed, ed // cfg.attention_downsample_rate,
                                     dtype),
            "norm_final": init_layer_norm(ed, dtype),
        },
        "upscale": {
            # ConvTranspose2d(256->64, k=2, s=2) then (64->32, k=2, s=2), HWIO.
            "conv1": {"w": 0.02 * jax.random.normal(kups[0], (2, 2, ed, ed // 4), dtype),
                      "b": jnp.zeros((ed // 4,), dtype)},
            "ln": init_layer_norm(ed // 4, dtype),
            "conv2": {"w": 0.02 * jax.random.normal(kups[1], (2, 2, ed // 4, ed // 8),
                                                    dtype),
                      "b": jnp.zeros((ed // 8,), dtype)},
        },
        "hypernet_mlps": [_init_mlp_chain(khyp[i], [ed, ed, ed, ed // 8], dtype)
                          for i in range(nmt)],
        "iou_head": _init_mlp_chain(ks[7], [ed] + [cfg.iou_head_hidden] *
                                    (cfg.iou_head_depth - 1) + [nmt], dtype),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _attn(params: Params, q, k, v, num_heads: int) -> jnp.ndarray:
    """SAM decoder attention: project, split heads, SDPA, recombine."""
    q = linear(params["q"], q)
    k = linear(params["k"], k)
    v = linear(params["v"], v)
    B, Nq, C = q.shape
    Nk = k.shape[1]
    hd = C // num_heads
    q = q.reshape(B, Nq, num_heads, hd)
    k = k.reshape(B, Nk, num_heads, hd)
    v = v.reshape(B, Nk, num_heads, hd)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32, precision=HIGHEST) / np.sqrt(hd)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=jnp.float32, precision=HIGHEST).astype(v.dtype)
    return linear(params["out"], out.reshape(B, Nq, C))


def _mlp_block(params: Params, x) -> jnp.ndarray:
    return linear(params["lin2"], relu(linear(params["lin1"], x)))


def _twoway_block(params: Params, queries, keys, query_pe, key_pe,
                  num_heads: int, skip_first_layer_pe: bool):
    if skip_first_layer_pe:
        queries = _attn(params["self_attn"], queries, queries, queries, num_heads)
    else:
        q = queries + query_pe
        queries = queries + _attn(params["self_attn"], q, q, queries, num_heads)
    queries = layer_norm(params["norm1"], queries)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _attn(params["cross_attn_t2i"], q, k, keys, num_heads)
    queries = layer_norm(params["norm2"], queries)

    queries = queries + _mlp_block(params["mlp"], queries)
    queries = layer_norm(params["norm3"], queries)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _attn(params["cross_attn_i2t"], k, q, queries, num_heads)
    keys = layer_norm(params["norm4"], keys)
    return queries, keys


def _twoway_transformer(params: Params, cfg: MaskDecoderConfig,
                        image_embedding, image_pe, point_embedding):
    """image_embedding/image_pe: (B, H, W, C); point_embedding: (B, N, C)."""
    B, H, W, C = image_embedding.shape
    keys = image_embedding.reshape(B, H * W, C)
    key_pe = image_pe.reshape(B, H * W, C) if image_pe.ndim == 4 else image_pe
    queries = point_embedding
    for i, bp in enumerate(params["blocks"]):
        queries, keys = _twoway_block(bp, queries, keys, point_embedding, key_pe,
                                      cfg.num_heads, skip_first_layer_pe=(i == 0))
    q = queries + point_embedding
    k = keys + key_pe
    queries = queries + _attn(params["final_attn"], q, k, keys, cfg.num_heads)
    queries = layer_norm(params["norm_final"], queries)
    return queries, keys


def _mlp_chain(params: Params, x) -> jnp.ndarray:
    n = len(params["layers"])
    for i, lp in enumerate(params["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = relu(x)
    return x


def predict_masks(params: Params, image_embedding: jnp.ndarray,
                  image_pe: jnp.ndarray, sparse_prompt: jnp.ndarray,
                  dense_prompt: jnp.ndarray,
                  cfg: MaskDecoderConfig = MaskDecoderConfig()
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predict low-res mask logits.

    image_embedding: (B, H, W, C) NHWC; image_pe: (H, W, C) or (B, H, W, C);
    sparse_prompt: (B, N, C); dense_prompt: (B, H, W, C).
    Returns (masks (B, num_mask_tokens, 4H, 4W), iou_pred (B, num_mask_tokens)).
    """
    B, H, W, C = image_embedding.shape
    nmt = cfg.num_mask_tokens
    output_tokens = jnp.concatenate([params["iou_token"], params["mask_tokens"]],
                                    axis=0).astype(sparse_prompt.dtype)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None], (B, 1 + nmt, C)), sparse_prompt],
        axis=1)

    src = image_embedding + dense_prompt
    if image_pe.ndim == 3:
        image_pe = jnp.broadcast_to(image_pe[None], (B, H, W, C))
    hs, src = _twoway_transformer(params["transformer"], cfg, src,
                                  image_pe.astype(src.dtype), tokens)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + nmt]

    src = src.reshape(B, H, W, C)
    up = params["upscale"]
    x = (conv_transpose2d(src, up["conv1"]["w"].astype(src.dtype))
         + up["conv1"]["b"].astype(src.dtype))
    x = gelu(layer_norm(up["ln"], x, eps=1e-6))
    x = (conv_transpose2d(x, up["conv2"]["w"].astype(x.dtype))
         + up["conv2"]["b"].astype(x.dtype))
    x = gelu(x)  # (B, 4H, 4W, C/8)

    hyper_in = jnp.stack(
        [_mlp_chain(params["hypernet_mlps"][i], mask_tokens_out[:, i])
         for i in range(nmt)], axis=1)  # (B, nmt, C/8)
    masks = jnp.einsum("btc,bhwc->bthw", hyper_in, x,
                       preferred_element_type=jnp.float32, precision=HIGHEST)
    iou_pred = _mlp_chain(params["iou_head"], iou_token_out.astype(jnp.float32))
    return masks, iou_pred


def select_single_mask(masks: jnp.ndarray, iou_pred: jnp.ndarray,
                       num_points: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ONNX-export `select_masks`: penalise the single-click token (index 0)
    unless >=3 points were given, then take the argmax-IoU mask."""
    penalty = jnp.array([1000.0] + [0.0] * (masks.shape[1] - 1), jnp.float32)
    score = iou_pred + (num_points - 2.5) * penalty
    best = jnp.argmax(score, axis=1)
    b = jnp.arange(masks.shape[0])
    return masks[b, best][:, None], iou_pred[b, best][:, None]
