"""Training data pipeline: host -> device prefetch (aux subsystem).

The reference is inference-only and has no loader; the TPU rebuild trains
(train/step.py), so it needs the standard input-pipeline discipline: the
host prepares batch N+1..N+depth while the device runs step N, hiding H2D
transfer behind compute. `jax.device_put` is asynchronous — the prefetcher
is a bounded queue of in-flight device batches, not a thread pool copying
bytes (XLA's transfer manager owns that). With a mesh, batches are
dp-sharded on the way in (each process feeds its addressable shards), so
the same loader drives single-chip, multi-chip, and multi-host training.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Iterable, Iterator, Optional

import jax
import numpy as np

from ..parallel.mesh import batch_sharding


def _default_placement(mesh) -> Callable[[Any], Any]:
    """Per-leaf placement: dp-shard the leading axis under a mesh, plain
    async device_put otherwise."""
    if mesh is None:
        return lambda leaf: jax.device_put(leaf)

    def place(leaf):
        return jax.device_put(leaf, batch_sharding(mesh, np.ndim(leaf)))

    return place


def prefetch_to_device(batches: Iterable[Any], depth: int = 2,
                       mesh=None,
                       placement: Optional[Callable[[Any], Any]] = None,
                       ) -> Iterator[Any]:
    """Yield device-resident batches, keeping `depth` transfers in flight.

    `batches` yields pytrees of host arrays with a shared leading batch
    axis. Each leaf is dispatched with an async `device_put` `depth`
    iterations before it is yielded, so the H2D copy of batch N+depth
    overlaps the device compute of batch N (the standard two-deep pipeline;
    depth=2 suffices because transfers are serialized per device anyway).
    `placement` overrides the per-leaf put (e.g. custom shardings).
    """
    assert depth >= 1
    place = placement or _default_placement(mesh)
    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        while len(queue) < depth:
            queue.append(jax.tree_util.tree_map(place, next(it)))
    except StopIteration:
        it = iter(())
    while queue:
        out = queue.popleft()
        try:
            queue.append(jax.tree_util.tree_map(place, next(it)))
        except StopIteration:
            pass
        yield out


def sam_batch_iterator(rng: np.random.Generator, *, batch_size: int,
                       image_size: int, mask_size: int,
                       steps: Optional[int] = None) -> Iterator[dict]:
    """Synthetic SAM train batches (images / point prompts / target masks)
    in the exact schema train/step.py consumes — the stand-in data source
    for tests and examples until a real dataset is wired in (checkpoints
    and datasets both need network; see tools/fetch_models.py)."""
    n = 0
    while steps is None or n < steps:
        yield {
            "images": rng.standard_normal(
                (batch_size, image_size, image_size, 3)).astype(np.float32),
            "point_coords": rng.uniform(
                0, image_size, (batch_size, 2, 2)).astype(np.float32),
            "point_labels": np.tile(np.array([[1.0, -1.0]], np.float32),
                                    (batch_size, 1)),
            "masks": (rng.random((batch_size, mask_size, mask_size)) > 0.5)
                     .astype(np.float32),
        }
        n += 1
