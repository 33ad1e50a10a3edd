from . import common, tinyvit, prompt_encoder, mask_decoder, sam

__all__ = ["common", "tinyvit", "prompt_encoder", "mask_decoder", "sam"]
