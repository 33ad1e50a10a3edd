from . import (
    birefnet,
    common,
    mask_decoder,
    prompt_encoder,
    sam,
    swin,
    tinyvit,
    vit_sam,
)

__all__ = ["birefnet", "common", "mask_decoder", "prompt_encoder", "sam",
           "swin", "tinyvit", "vit_sam"]
