from .batch import decode_prompt_batch, encode_frames, segment_frames
from .mesh import batch_sharding, make_mesh, sam_param_sharding
from .multihost import (
    global_mesh,
    initialize,
    local_rows,
    process_local_batch,
    replicate_params,
)

__all__ = ["batch_sharding", "decode_prompt_batch", "encode_frames",
           "global_mesh", "initialize", "local_rows", "make_mesh",
           "process_local_batch", "replicate_params", "sam_param_sharding",
           "segment_frames"]
