"""Spatially-sharded BiRefNet inference: `segment_objects` latency scale-out.

dp (parallel/batch.py `segment_frames`) scales BiRefNet THROUGHPUT — one
frame per chip — but cannot touch single-image latency, and the high_res
tier is the slowest program in the library (chip-measured 385 ms @2048,
BENCH_NOTES round 4; batching was measured NOT to help: the deformable-
sampling gathers scale with total pixels). The reference has no analog —
its BiRefNet path is one ORT session on one accelerator
(/root/reference/src/segmentation.cpp:221-242). For a conv-decoder graph
the natural latency axis is the image plane itself: shard the ROW
dimension of the canvas across the mesh and let XLA's SPMD partitioner
keep every conv / window-attention stage row-local, exchanging halos.

Design — idiomatic GSPMD: annotate only the jit boundary (canvas
P(None, 'sp') over rows, params replicated, logits replicated out) and let
the partitioner insert the collectives:

  * 3x3/7x7 convs and the Swin (shifted-)window attention partition
    row-locally with halo exchanges (collective-permutes — their presence
    and the row-sharded entry shapes are pinned by tests/test_spatial.py).
  * Genuinely global ops reshard as needed: the align_corners resize
    matmuls (dense over the row axis), global-average pooling, the
    deformable-sampling corner tables (data-dependent indices can reach
    any row, so each gather all-gathers its table), and the
    `_get_patches` space-to-channel shuffles. Their cost rides ICI; the
    deform-table all-gather is the structural price of keeping the
    LATENCY-bound random gathers (the dominant @2048 cost, BENCH_NOTES
    round-4 l1 ledger) split 1/sp per chip while the table arrives as one
    contiguous ICI transfer.

Exactness: identical math modulo f32 collective reassociation — measured
max|d| ~2e-7 vs the single-device path on the virtual 8-device CPU mesh.

Multi-chip TPU hardware is not reachable from this environment: like
parallel/sp.py, the tier is validated for structure (entry parameters
actually row-sharded, halo collectives present in the compiled module)
plus numerical parity on the virtual CPU mesh, and the driver's
dryrun_multichip gate executes it every round.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.birefnet import BiRefNetConfig, birefnet_apply
from .sp import make_sp_mesh

__all__ = ["make_spatial_mesh", "birefnet_apply_spatial",
           "segment_image_spatial"]

# Same 1-D mesh shape as the sequence-parallel tier; the axis is rows here
# instead of window-shards, so one ('sp',) serving mesh serves both.
make_spatial_mesh = make_sp_mesh

_JIT_CACHE: dict = {}


def birefnet_apply_spatial(params, x: jnp.ndarray, cfg: BiRefNetConfig,
                           mesh: Mesh, axis: str = "sp") -> jnp.ndarray:
    """Row-sharded `birefnet_apply`: same contract + a mesh.

    x: (B, S, S, 3) ImageNet-normalised pixels, sharded P(None, axis)
    (rows) on entry; returns (B, S, S, 1) f32 logits, replicated. S must be
    divisible by 64 (the model's own constraint); GSPMD handles any
    S/mesh-size remainder by padding internally, but S % (64 * sp) == 0
    gives every device whole half-res Swin windows and is what the serving
    buckets satisfy.
    """
    repl = NamedSharding(mesh, P())
    key = ("birefnet_spatial", cfg, mesh, axis,
           jax.tree_util.tree_structure(params))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            lambda p, im: birefnet_apply(p, im, cfg),
            in_shardings=(jax.tree_util.tree_map(lambda _: repl, params),
                          NamedSharding(mesh, P(None, axis))),
            out_shardings=repl,
        )
        _JIT_CACHE[key] = fn
    return fn(params, x)


def segment_image_spatial(params, cfg: BiRefNetConfig, x: jnp.ndarray,
                          mesh: Mesh | None = None) -> jnp.ndarray:
    """BiRefNet logits for one (or few) images with rows sharded over every
    available device (the single-image-latency analog of
    parallel/batch.segment_frames)."""
    mesh = mesh or make_spatial_mesh()
    return birefnet_apply_spatial(params, x, cfg, mesh)
