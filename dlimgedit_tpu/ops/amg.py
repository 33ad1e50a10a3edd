"""Device primitives for automatic mask generation ("segment everything").

The upstream SAM repo ships SamAutomaticMaskGenerator (a host-side Python
loop: per-point predictor calls, numpy filtering, torchvision box NMS); the
reference library has no counterpart.  Here the WHOLE pipeline — point grid,
batched decode, stability/area/box statistics, greedy box NMS and top-K
selection — is expressed as ONE XLA program (runtime/amg.py) so a single
dispatch and a single fetch produce every mask of an image.

This module holds the pure, unit-testable pieces.  Everything is static
shape: candidate counts are padded, invalid candidates ride along with
score -1 and are dropped on the host.  The greedy NMS is the exact
sequential algorithm (a `lax.fori_loop` over score-sorted rows of a
precomputed IoU matrix), not a parallel approximation — its keep set is
bit-identical to the reference numpy loop (tests/test_amg.py oracle).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def point_grid(n: int, crop_w, crop_h) -> jnp.ndarray:
    """(n*n, 2) float32 (x, y) prompt grid centred over the valid region.

    `crop_w`/`crop_h` are traced scalars (the resize-longest-side extent in
    model-input pixels), so one executable serves every image shape.  Points
    sit at cell centres, matching SamAutomaticMaskGenerator's
    build_point_grid (upstream samples (i+0.5)/n in [0,1] and scales by the
    image side).
    """
    f = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    xs = f * crop_w
    ys = f * crop_h
    px = jnp.tile(xs[None, :], (n, 1)).reshape(-1)
    py = jnp.tile(ys[:, None], (1, n)).reshape(-1)
    return jnp.stack([px, py], axis=-1)


def stability_scores(logits: jnp.ndarray, valid: jnp.ndarray | None = None,
                     offset: float = 1.0) -> jnp.ndarray:
    """(..., L, L) logits -> (...,) stability = |m > +off| / |m > -off|.

    Upstream calculate_stability_score with mask_threshold 0: the ratio of
    the mask's area when the threshold is shifted up vs down by `offset`.
    A mask whose boundary is crisp (logits far from 0) scores ~1.  `valid`
    restricts both areas to the un-padded canvas region.
    """
    hi = logits > offset
    lo = logits > -offset
    if valid is not None:
        hi = hi & valid
        lo = lo & valid
    hi_a = hi.sum(axis=(-1, -2)).astype(jnp.float32)
    lo_a = lo.sum(axis=(-1, -2)).astype(jnp.float32)
    return hi_a / jnp.maximum(lo_a, 1.0)


def mask_boxes(binary: jnp.ndarray) -> jnp.ndarray:
    """(..., L, L) bool -> (..., 4) float32 [x0, y0, x1, y1] inclusive.

    An empty mask yields x0 = L, x1 = -1 (and same for y), so its
    inclusive width/height clamp to 0 in `box_iou_matrix`.
    """
    L = binary.shape[-1]
    idx = jnp.arange(L)
    rows = binary.any(axis=-1)  # (..., Ly): which y rows are occupied
    cols = binary.any(axis=-2)  # (..., Lx): which x cols are occupied
    y0 = jnp.min(jnp.where(rows, idx, L), axis=-1)
    y1 = jnp.max(jnp.where(rows, idx, -1), axis=-1)
    x0 = jnp.min(jnp.where(cols, idx, L), axis=-1)
    x1 = jnp.max(jnp.where(cols, idx, -1), axis=-1)
    return jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.float32)


def box_iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(M, 4) inclusive pixel boxes -> (M, M) IoU (diagonal = 1)."""
    x0, y0, x1, y1 = (boxes[:, i] for i in range(4))
    area = (jnp.maximum(x1 - x0 + 1, 0.0)
            * jnp.maximum(y1 - y0 + 1, 0.0))
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    inter = (jnp.maximum(ix1 - ix0 + 1, 0.0)
             * jnp.maximum(iy1 - iy0 + 1, 0.0))
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1.0)


def greedy_nms(boxes_sorted: jnp.ndarray, scores_sorted: jnp.ndarray,
               thresh) -> jnp.ndarray:
    """Exact greedy box NMS over score-descending candidates -> bool keep.

    Candidates with score <= 0 are invalid and never kept (the caller marks
    filtered-out candidates with score -1 before sorting).  Semantics match
    torchvision.ops.nms: walk candidates best-first; each kept candidate
    suppresses every LATER candidate whose box IoU with it exceeds
    `thresh`.  The IoU matrix is materialised once (M x M) and the
    sequential dependence is an M-step fori_loop over its rows — M is the
    pre-NMS pool (hundreds), so this is microseconds on device.
    """
    M = boxes_sorted.shape[0]
    iou = box_iou_matrix(boxes_sorted)
    idx = jnp.arange(M)

    def body(i, keep):
        suppress = keep[i] & (iou[i] > thresh) & (idx > i)
        return keep & ~suppress

    keep0 = scores_sorted > 0.0
    return lax.fori_loop(0, M, body, keep0)
