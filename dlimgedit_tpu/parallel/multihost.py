"""Multi-host (multi-process) execution — the DCN tier of the scale-out plan.

The reference is a single-process library (SURVEY.md §2: parallelism
"explicitly NOT present"); `mesh.py` adds the single-host ICI tier (dp × tp
over one process's chips). This module adds the multi-host tier: several
processes, each owning a slice of the TPU pod, joined by JAX's distributed
runtime. The design follows the standard TPU scaling recipe:

  * the **tp axis stays inside one host** — tensor-parallel collectives
    (the per-layer psums of the Megatron rules in `mesh.sam_param_sharding`)
    ride ICI, never DCN;
  * only the **dp axis crosses hosts** — its sole collective is the gradient
    all-reduce of the train step (one psum per step, DCN-tolerant) and the
    inference paths have no cross-host communication at all.

This is pure jax.distributed + GSPMD: no hand-written NCCL/MPI layer exists
(XLA owns ICI and DCN). Everything here is hermetically testable on CPU —
`tests/test_multihost.py` spawns real multi-process workers with virtual
devices and Gloo cross-process collectives, per SURVEY.md §4's
hardware-free-tier rule.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the multi-process runtime. Call once, before any jax computation.

    `coordinator_address` is `"host:port"` of process 0. On real pods with a
    TPU-aware launcher (GKE/Borg) jax can infer all three arguments and
    callers should use `jax.distributed.initialize()` directly; this wrapper
    exists for explicit/CPU-worker launches and keeps the import surface of
    the package stable.
    """
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(dp: Optional[int] = None, tp: Optional[int] = None,
                devices=None) -> Mesh:
    """A (dp, tp) mesh over ALL processes' devices, tp packed within a host.

    Devices are ordered (process, local id) and reshaped so that each tp
    group is a contiguous run of ONE process's devices — tp collectives stay
    on ICI — while dp strides across processes (DCN). `tp` must divide the
    per-process device count for that guarantee; it is asserted, not
    silently degraded. `devices` overrides `jax.devices()` (tests pass the
    virtual-CPU set).
    """
    devices = sorted(devices if devices is not None else jax.devices(),
                     key=lambda d: (d.process_index, d.id))
    counts = {}
    for d in devices:
        counts[d.process_index] = counts.get(d.process_index, 0) + 1
    local = min(counts.values())
    assert min(counts.values()) == max(counts.values()), (
        f"uneven devices per process: {counts}")
    n = len(devices)
    if tp is None:
        # Derive from an explicit dp; otherwise the default heuristic.
        tp = (n // dp) if dp else (2 if local % 2 == 0 and n >= 4 else 1)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    assert local % tp == 0, (
        f"tp={tp} would span hosts (local device count {local}); "
        f"tensor-parallel collectives must stay on ICI")
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


def process_local_batch(mesh: Mesh, local_data: np.ndarray,
                        global_batch: int) -> jax.Array:
    """Assemble the global dp-sharded batch from this process's shard.

    `local_data` is the rows this process feeds (global_batch / num_processes
    leading entries, in global order); the returned global array is sharded
    P("dp", None, ...) over `mesh` without any cross-host data movement.
    """
    sharding = NamedSharding(
        mesh, P("dp", *([None] * (local_data.ndim - 1))))
    return jax.make_array_from_process_local_data(
        sharding, local_data, (global_batch,) + local_data.shape[1:])


def replicate_params(mesh: Mesh, params):
    """Place a host-identical param pytree replicated over the global mesh.

    Every process must pass the same values (same seed / same checkpoint);
    each transfers only its addressable shards.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), params)


def local_rows(garr: jax.Array) -> np.ndarray:
    """This process's rows of a dp-sharded global array, in global order.

    Requires the array to be sharded on the LEADING axis only (batch
    convention: P("dp", None, ...)). With tp > 1 every dp shard is then
    replicated across its tp group — the same row range appears once per
    tp-local device — and is deduplicated by index. Trailing-axis sharding
    is rejected (deduplication by leading index would silently keep one
    arbitrary slice of each row block).
    """
    seen = {}
    for s in garr.addressable_shards:
        for d, idx in enumerate(s.index[1:], start=1):
            if (idx.start or 0) != 0 or (
                    idx.stop is not None and idx.stop != garr.shape[d]):
                raise ValueError(
                    f"local_rows needs leading-axis sharding only; axis {d} "
                    f"of a shard covers {idx}, not the full extent "
                    f"{garr.shape[d]}")
        seen.setdefault(s.index[0].start or 0, s)
    return np.concatenate(
        [np.asarray(seen[k].data) for k in sorted(seen)], axis=0)
