"""Device mesh + sharding rules (the scale-out module, SURVEY.md §2 note).

The reference is single-accelerator (no parallelism subsystem exists there —
SURVEY.md §2 "explicitly NOT present"); this module is the TPU-native
scale-out design: a (dp, tp) `jax.sharding.Mesh`, GSPMD sharding rules for
SAM parameter pytrees (tensor-parallel attention/MLP weights), and batch
sharding for streaming-frame data parallelism (BASELINE config 5). XLA
inserts the ICI collectives; there is no hand-written NCCL-style layer.

Axes:
  dp — data parallel over images/frames (embarrassingly parallel encode).
  tp — tensor parallel over attention heads / MLP hidden dims of the encoder
       (relevant for ViT-H at high resolution, BASELINE config 4).
  sp — sequence parallel over the encoder's token windows (parallel/sp.py:
       single-image latency scale-out; zero communication for windowed
       blocks, one all_gather per global block).
Pipeline/expert axes are intentionally absent: 2-layer decoders and dense
ViTs have no profitable pp decomposition at this scale (ViT-H fits one v5e
chip 12x over — stage-sharding would only add bubble latency), and no model
in the family has experts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            # Fall back to the (virtual-device-capable) CPU backend — the
            # hostless multi-chip test path (SURVEY.md §4 implication).
            devices = jax.devices("cpu")
    n = n_devices or len(devices)
    if dp is None and tp is None:
        # Favour dp (encode throughput scales linearly); give tp a factor of 2
        # when available for the big-encoder configs.
        tp = 2 if n % 2 == 0 and n >= 4 else 1
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(np.asarray(devices[:n]).reshape(dp, tp), ("dp", "tp"))


def _spec_for_path(path: str, leaf) -> P:
    """Tensor-parallel sharding rule for a SAM parameter leaf.

    Column-parallel (shard output dim) for QKV / MLP-in projections,
    row-parallel (shard input dim) for attention-out / MLP-out projections —
    the Megatron pattern; XLA inserts the psum at the row-parallel boundary.
    Everything else (norms, biases, tables, convs) is replicated.
    """
    if leaf.ndim != 2:
        return P()
    if any(k in path for k in ("qkv/w", "fc1/w", "lin1/w", "/q/w", "/k/w",
                               "/v/w")):
        return P(None, "tp")
    if any(k in path for k in ("proj/w", "fc2/w", "lin2/w", "/out/w")):
        return P("tp", None)
    return P()


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_paths(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], tree


def sam_param_sharding(params, mesh: Mesh):
    """NamedSharding pytree for SAM params under `mesh` (tp weights sharded
    only when the dimension divides evenly; otherwise replicated)."""
    tp = mesh.shape["tp"]

    def shard_one(path, leaf):
        spec = _spec_for_path(path, leaf)
        for dim, axis in enumerate(spec):
            if axis == "tp" and leaf.shape[dim] % tp != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    flat = list(_tree_paths(params))
    shardings = {p: shard_one(p, l) for p, l in flat}

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        return shardings[prefix[:-1]]

    return rebuild(params)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch/frame) axis over dp; replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
