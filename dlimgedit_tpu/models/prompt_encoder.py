"""SAM prompt encoder in pure JAX (ONNX-decoder-compatible semantics).

Re-implements what the reference runs inside `sam_mask_decoder_*.onnx`
(/root/reference/src/segmentation.cpp:18-24,131-160): random-Fourier
positional encoding of point/box prompts with the label protocol
  1 = positive point, -1 = padding, 2 = box top-left, 3 = box bottom-right
(reference builds these in segmentation.cpp:146-152) plus the dense
no-mask embedding / mask-downscaling path gated by `has_mask_input`.

Architecture follows SAM (Kirillov et al., 2023) prompt encoder.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    Params,
    conv2d,
    gelu,
    init_conv,
    init_layer_norm,
    layer_norm,
)


@dataclass(frozen=True)
class PromptEncoderConfig:
    embed_dim: int = 256
    image_embedding_size: int = 64   # H = W of the image embedding
    input_image_size: int = 1024     # padded model input resolution
    mask_in_chans: int = 16


def init_prompt_encoder(key, cfg: PromptEncoderConfig = PromptEncoderConfig(),
                        dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 9)
    ed = cfg.embed_dim
    mc = cfg.mask_in_chans
    return {
        # PositionEmbeddingRandom gaussian matrix, scale=1.
        "pe_gaussian": jax.random.normal(ks[0], (2, ed // 2), dtype),
        # 4 point embeddings: [neg point(0), pos point(1), box tl(2), box br(3)]
        "point_embeddings": jax.random.normal(ks[1], (4, ed), dtype),
        "not_a_point_embed": jax.random.normal(ks[2], (1, ed), dtype),
        "no_mask_embed": jax.random.normal(ks[3], (1, ed), dtype),
        "mask_downscaling": {
            "conv1": {**init_conv(ks[4], 1, mc // 4, 2, dtype=dtype),
                      "b": jnp.zeros((mc // 4,), dtype)},
            "ln1": init_layer_norm(mc // 4, dtype),
            "conv2": {**init_conv(ks[5], mc // 4, mc, 2, dtype=dtype),
                      "b": jnp.zeros((mc,), dtype)},
            "ln2": init_layer_norm(mc, dtype),
            "conv3": {**init_conv(ks[6], mc, ed, 1, dtype=dtype),
                      "b": jnp.zeros((ed,), dtype)},
        },
    }


def pe_encoding(params: Params, coords01: jnp.ndarray) -> jnp.ndarray:
    """Random-Fourier positional encoding of [0,1]-normalised (x, y) coords.

    coords01: (..., 2) -> (..., embed_dim). Computed in f32 (sin/cos of large
    phases is precision-sensitive)."""
    coords = 2.0 * coords01.astype(jnp.float32) - 1.0
    # Elementwise rather than a K=2 matmul: exact in f32 (the default matmul
    # path rounds inputs to bf16) and avoids a degenerate MXU op.
    g = params["pe_gaussian"].astype(jnp.float32)
    coords = coords[..., 0:1] * g[0] + coords[..., 1:2] * g[1]
    coords = 2.0 * np.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def dense_pe(params: Params, cfg: PromptEncoderConfig) -> jnp.ndarray:
    """Positional encoding of the image-embedding grid -> (H, W, embed_dim)."""
    s = cfg.image_embedding_size
    r = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    y = jnp.broadcast_to(r[:, None], (s, s))
    x = jnp.broadcast_to(r[None, :], (s, s))
    return pe_encoding(params, jnp.stack([x, y], axis=-1))


def embed_points(params: Params, cfg: PromptEncoderConfig,
                 point_coords: jnp.ndarray, point_labels: jnp.ndarray
                 ) -> jnp.ndarray:
    """Sparse prompt embedding, ONNX-export semantics
    (segment-anything onnx model `_embed_points`):
      coords are in padded-1024 pixel space; +0.5 centres the pixel.

    point_coords: (B, N, 2) float (x, y); point_labels: (B, N) float/int.
    Returns (B, N, embed_dim)."""
    coords = (point_coords.astype(jnp.float32) + 0.5) / float(cfg.input_image_size)
    emb = pe_encoding(params, coords)  # (B, N, ed)
    labels = point_labels.astype(jnp.float32)[..., None]
    emb = emb * (labels != -1)
    emb = emb + params["not_a_point_embed"][0].astype(jnp.float32) * (labels == -1)
    for i in range(4):
        emb = emb + params["point_embeddings"][i].astype(jnp.float32) * (labels == i)
    return emb


def embed_masks(params: Params, cfg: PromptEncoderConfig,
                mask_input: jnp.ndarray, has_mask: jnp.ndarray) -> jnp.ndarray:
    """Dense prompt embedding (B, H, W, embed_dim).

    mask_input: (B, 4*H, 4*W, 1) low-res mask logits (256x256 for SAM);
    has_mask: (B,) or scalar — blends the downscaled mask against the
    learned no-mask embedding, exactly like the ONNX graph."""
    md = params["mask_downscaling"]
    x = mask_input
    # Bias adds cast to the activation dtype — an f32 bias against a bf16
    # activation would silently promote the rest of the decode to f32.
    x = (conv2d(x, md["conv1"]["w"].astype(x.dtype), stride=2)
         + md["conv1"]["b"].astype(x.dtype))
    x = gelu(layer_norm(md["ln1"], x, eps=1e-6))
    x = (conv2d(x, md["conv2"]["w"].astype(x.dtype), stride=2)
         + md["conv2"]["b"].astype(x.dtype))
    x = gelu(layer_norm(md["ln2"], x, eps=1e-6))
    x = (conv2d(x, md["conv3"]["w"].astype(x.dtype))
         + md["conv3"]["b"].astype(x.dtype))
    no_mask = params["no_mask_embed"][0].astype(x.dtype)
    hm = jnp.reshape(has_mask.astype(x.dtype), (-1, 1, 1, 1))
    return hm * x + (1.0 - hm) * no_mask
