from .batch import decode_prompt_batch, encode_frames, segment_frames
from .mesh import batch_sharding, make_mesh, sam_param_sharding

__all__ = ["batch_sharding", "decode_prompt_batch", "encode_frames",
           "make_mesh", "sam_param_sharding", "segment_frames"]
