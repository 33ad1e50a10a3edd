"""SAM model family: assembled image encoder + prompt encoder + mask decoder.

Variants mirror the reference's model set and the BASELINE configs:
  * "mobile_sam" / "vit_t": TinyViT-5M encoder (the reference's default,
    mobile_sam_image_encoder.onnx, /root/reference/src/segmentation.cpp:14)
  * "vit_b", "vit_l", "vit_h": original SAM ViT encoders (BASELINE configs 3/4)

All functions are pure; parameters are pytrees. Image embeddings are NHWC
(B, 64, 64, 256).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params
from .mask_decoder import (
    MaskDecoderConfig,
    init_mask_decoder,
    predict_masks,
    select_single_mask,
)
from .prompt_encoder import (
    PromptEncoderConfig,
    dense_pe,
    embed_masks,
    embed_points,
    init_prompt_encoder,
)
from .tinyvit import TinyViTConfig, init_tiny_vit, tiny_vit_apply

# SAM pixel normalisation (baked into the reference's encoder graph via
# use_preprocess=True, script/export_models.py:21-27).
SAM_PIXEL_MEAN = (123.675, 116.28, 103.53)
SAM_PIXEL_STD = (58.395, 57.12, 57.375)


@dataclass(frozen=True)
class SamConfig:
    variant: str = "mobile_sam"
    image_size: int = 1024
    encoder_tiny: Optional[TinyViTConfig] = None
    encoder_vit: Optional["SamViTConfig"] = None  # noqa: F821
    prompt: PromptEncoderConfig = PromptEncoderConfig()
    decoder: MaskDecoderConfig = MaskDecoderConfig()

    def __post_init__(self):
        if self.encoder_tiny is None and self.encoder_vit is None:
            raise ValueError(
                "SamConfig needs exactly one encoder config (encoder_tiny "
                "or encoder_vit) — build configs via sam.make_config()")

    @property
    def embedding_size(self) -> int:
        return self.prompt.image_embedding_size

    @property
    def mask_input_size(self) -> int:
        # 4 * embedding size = 256 for SAM (segmentation.cpp:43 mask_input).
        return 4 * self.embedding_size


def make_config(variant: str = "mobile_sam", image_size: int = 1024) -> SamConfig:
    prompt = PromptEncoderConfig(image_embedding_size=image_size // 16,
                                 input_image_size=image_size)
    if variant in ("mobile_sam", "vit_t"):
        return SamConfig(variant="mobile_sam", image_size=image_size,
                         encoder_tiny=TinyViTConfig(img_size=image_size),
                         prompt=prompt)
    if variant in ("vit_b", "vit_l", "vit_h"):
        from .vit_sam import SamViTConfig, VIT_PRESETS

        return SamConfig(variant=variant, image_size=image_size,
                         encoder_vit=VIT_PRESETS[variant](img_size=image_size),
                         prompt=prompt)
    raise ValueError(f"Unknown SAM variant: {variant}")


def init_sam(key, cfg: SamConfig, dtype=jnp.float32) -> Params:
    k_enc, k_pe, k_dec = jax.random.split(key, 3)
    if cfg.encoder_tiny is not None:
        encoder = init_tiny_vit(k_enc, cfg.encoder_tiny, dtype)
    else:
        from .vit_sam import init_sam_vit

        encoder = init_sam_vit(k_enc, cfg.encoder_vit, dtype)
    return {
        "encoder": encoder,
        "prompt_encoder": init_prompt_encoder(k_pe, cfg.prompt, dtype),
        "decoder": init_mask_decoder(k_dec, cfg.decoder, dtype),
    }


def encode_image(params: Params, cfg: SamConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, S, S, 3) normalised pixels -> (B, S/16, S/16, 256) embedding."""
    if cfg.encoder_tiny is not None:
        return tiny_vit_apply(params["encoder"], x, cfg.encoder_tiny)
    from .vit_sam import sam_vit_apply

    return sam_vit_apply(params["encoder"], x, cfg.encoder_vit)


def decode_masks(params: Params, cfg: SamConfig, image_embedding: jnp.ndarray,
                 point_coords: jnp.ndarray, point_labels: jnp.ndarray,
                 mask_input: Optional[jnp.ndarray] = None,
                 has_mask: Optional[jnp.ndarray] = None,
                 multimask: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run prompt encoder + mask decoder; ONNX-decoder-equivalent semantics.

    image_embedding: (B, He, We, C) NHWC.
    point_coords: (B, N, 2) in padded-image pixel space; point_labels: (B, N).
    Returns (low_res_masks, iou_pred): multimask -> (B, 4, 256, 256), (B, 4);
    otherwise the ONNX single-mask selection -> (B, 1, 256, 256), (B, 1).
    """
    B = image_embedding.shape[0]
    s = cfg.mask_input_size
    # has_mask defaults to MATCH mask_input: ones when a mask was supplied
    # (otherwise an iterative-refinement caller's mask would be silently
    # blended away), zeros for the standard no-mask prompt.
    if has_mask is None:
        has_mask = (jnp.zeros((B,), image_embedding.dtype)
                    if mask_input is None
                    else jnp.ones((B,), image_embedding.dtype))
    if mask_input is None:
        mask_input = jnp.zeros((B, s, s, 1), image_embedding.dtype)

    pe_params = params["prompt_encoder"]
    sparse = embed_points(pe_params, cfg.prompt, point_coords, point_labels)
    sparse = sparse.astype(image_embedding.dtype)
    dense = embed_masks(pe_params, cfg.prompt, mask_input, has_mask)
    image_pe = dense_pe(pe_params, cfg.prompt)

    masks, iou = predict_masks(params["decoder"], image_embedding, image_pe,
                               sparse, dense, cfg.decoder)
    if not multimask:
        masks, iou = select_single_mask(masks, iou,
                                        num_points=point_coords.shape[1])
    return masks, iou
