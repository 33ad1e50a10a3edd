"""Batched / streaming multi-device execution (BASELINE configs 3 & 5).

  * `encode_frames` — data-parallel image embedding over a device mesh:
    the streaming-frames config ("per-frame embeddings + interactive mask
    edits, pmap over frames"), expressed with jit + NamedSharding (the
    modern replacement for pmap: XLA partitions the batch over dp and the
    tensor-parallel encoder weights over tp in ONE program).
  * `decode_prompt_batch` — many prompts against one cached embedding
    (config 3: "batched multi-point mask decode"), a single vmapped decode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import sam as sam_lib
from .mesh import batch_sharding, make_mesh, sam_param_sharding


# One jitted wrapper per (config, mesh, param structure). Rebuilding the
# jax.jit wrapper on every call would miss jax's trace cache and retrace
# (and, without the persistent compile cache, recompile) every invocation —
# costly for the streaming/video workloads these APIs target. The sharding
# trees depend only on the param tree *structure*, so the treedef keys them.
_JIT_CACHE: dict = {}


def encode_frames(params, cfg: sam_lib.SamConfig, frames: jnp.ndarray,
                  mesh=None):
    """frames: (B, S, S, 3) preprocessed pixels, B divisible by mesh dp.
    Returns (B, S/16, S/16, 256) embeddings, batch-sharded over dp."""
    mesh = mesh or make_mesh()
    key = ("encode", cfg, mesh, jax.tree_util.tree_structure(params))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, x: sam_lib.encode_image(p, cfg, x),
            in_shardings=(sam_param_sharding(params, mesh),
                          batch_sharding(mesh, 4)),
            out_shardings=batch_sharding(mesh, 4),
        )
        _JIT_CACHE[key] = fn
    return fn(params, frames)


def decode_prompt_batch(params, cfg: sam_lib.SamConfig, embedding,
                        point_coords, point_labels, multimask: bool = False):
    """Decode N prompts against ONE embedding in a single XLA program.

    embedding: (1, He, We, C); point_coords: (N, 2, 2); point_labels: (N, 2).
    Returns (masks (N, T, 4He, 4We), iou (N, T)). The image embedding is
    broadcast inside the program — no N-fold HBM duplication."""

    def one(pc, pl):
        m, i = sam_lib.decode_masks(params, cfg, embedding, pc[None], pl[None],
                                    multimask=multimask)
        return m[0], i[0]

    return jax.vmap(one)(point_coords, point_labels)


def segment_frames(params, cfg, frames: jnp.ndarray, mesh=None):
    """Data-parallel BiRefNet foreground masks for a batch of frames.

    frames: (B, S, S, 3) ImageNet-normalised pixels, B divisible by mesh dp
    (the streaming analog of `segment_objects` for video/burst workloads —
    the reference has no batched BiRefNet path at all). Params are
    replicated (the model is conv-dominated; batch parallelism is the
    right axis), frames and logits are batch-sharded over dp.

    Returns (B, S, S, 1) foreground logits, batch-sharded."""
    from ..models.birefnet import birefnet_apply

    mesh = mesh or make_mesh()
    key = ("segment", cfg, mesh, jax.tree_util.tree_structure(params))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        replicated = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())
        p_shard = jax.tree_util.tree_map(lambda _: replicated, params)
        fn = jax.jit(
            lambda p, x: birefnet_apply(p, x, cfg),
            in_shardings=(p_shard, batch_sharding(mesh, 4)),
            out_shardings=batch_sharding(mesh, 4),
        )
        _JIT_CACHE[key] = fn
    return fn(params, frames)
