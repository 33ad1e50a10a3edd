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

from .connected import _label_components


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


def _per_pixel_sizes(labels: jnp.ndarray, mask: jnp.ndarray):
    """(H, W) component labels -> per-pixel component area (f32) plus the
    label of the largest component (int32; 0 if `mask` is empty)."""
    H, W = labels.shape
    sizes = jnp.zeros((H * W + 1,), jnp.int32).at[labels.ravel()].add(
        mask.ravel().astype(jnp.int32))
    sizes = sizes.at[0].set(0)  # background label carries no component
    largest = jnp.argmax(sizes).astype(jnp.int32)
    per_pix = jnp.take(sizes, labels.reshape(-1)).reshape(H, W)
    return per_pix.astype(jnp.float32), largest


def refine_mask_logits(logits: jnp.ndarray, valid: jnp.ndarray,
                       min_area, max_iters: int = 64) -> jnp.ndarray:
    """(L, L) mask logits -> logits with sub-`min_area` regions removed.

    The device analog of upstream SamAutomaticMaskGenerator's
    `min_mask_region_area` post-filter (`postprocess_small_regions` /
    `remove_small_regions`), in the same order and with the same
    8-connectivity as its cv2.connectedComponentsWithStats calls:

      1. holes — 8-connected components of the mask complement smaller
         than `min_area` are filled (the outer background is always huge,
         so it survives; holes merged with the padding region count as
         background and are never filled);
      2. islands — components of the hole-filled mask smaller than
         `min_area` are removed, keeping the LARGEST island if every one
         falls below the threshold (upstream keeps argmax in that case).

    Deviations from upstream, by design: the filter runs on the low-res
    logit grid (`min_area` is a traced scalar in low-res pixels — the
    caller converts from original-image pixels), and the result is
    expressed by clamping logits (+8 for filled holes, -8 for removed
    islands) so the downstream bilinear upsample + threshold renders the
    filtered mask with smooth boundaries instead of blocky low-res
    staircases. Upstream's post-filter re-NMS over changed boxes is
    skipped: here the filter runs on the NMS winners, and a filtered
    mask's box only ever shrinks.
    """
    binary = (logits > 0) & valid
    # Holes first (upstream order): small components of the complement.
    inv = ~binary
    lab_h, _ = _label_components(inv, max_iters, conn8=True)
    hole_sz, _ = _per_pixel_sizes(lab_h, inv)
    fill = inv & valid & (hole_sz < min_area)
    filled = binary | fill
    # Islands on the hole-filled mask.
    lab_i, _ = _label_components(filled, max_iters, conn8=True)
    isl_sz, largest = _per_pixel_sizes(lab_i, filled)
    big = filled & (isl_sz >= min_area)
    any_big = jnp.any(big)
    keep = jnp.where(any_big, big, filled & (lab_i == largest))
    force_on = keep & ~binary
    force_off = binary & ~keep
    out = jnp.where(force_on, jnp.maximum(logits, 8.0), logits)
    return jnp.where(force_off, jnp.minimum(out, -8.0), out)


def greedy_nms(boxes_sorted: jnp.ndarray, scores_sorted: jnp.ndarray,
               thresh) -> jnp.ndarray:
    """Exact greedy box NMS over score-descending candidates -> bool keep.

    Candidates with score <= 0 are invalid and never kept (the caller marks
    filtered-out candidates with score -1 before sorting). DOCUMENTED
    CONTRACT: this gate — like the host-side `score <= 0` stop in
    runtime/amg.generate_masks and the C bridge's while-loop — also
    discards a candidate that passed every filter but whose PREDICTED IoU
    is <= 0. Such a mask is one the decoder itself rates as garbage, so
    the conflation is intentional; callers wanting `iou_thresh <= 0`
    semantics should know masks with non-positive predicted IoU never
    survive.  Semantics match
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
