"""Automatic mask generation: every object mask of an image in one program.

Upstream SAM ships this as SamAutomaticMaskGenerator — a host loop of
per-point predictor calls, numpy filtering and torchvision NMS (seconds per
image on a GPU).  The reference library (/root/reference) has no analog.
The TPU-native rework keeps the entire pipeline on device as ONE jitted
program per (variant, bucket, grid, max_masks):

  pass A  — `lax.map` over point-grid chunks: vmapped multimask decodes
            against the cached embedding; only per-candidate STATISTICS
            (predicted IoU, stability score, area, bounding box at the
            low-res mask grid) survive the chunk — the 3*grid^2 candidate
            logits are never materialised at once.
  filter  — IoU / stability / area thresholds (traced scalars: changing a
            threshold does NOT recompile), invalid candidates -> score -1.
  NMS     — exact greedy box NMS over the top-P pool (ops/amg.py), then
            top-K winners by predicted IoU.
  pass B  — re-decode ONLY the K winners (gathering their grid points and
            token ids), fused upsample to the canvas bucket, on-device
            bit-pack.  Recomputing K decodes is far cheaper than carrying
            3*grid^2 low-res masks through pass A (grid 32: 3072 masks x
            256^2 f32 = 805 MB vs 64 re-decodes).

One dispatch, one fetch: packed masks + scores cross the PCIe/tunnel once.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models import sam as sam_lib
from ..ops.amg import (
    greedy_nms,
    mask_boxes,
    point_grid,
    refine_mask_logits,
    stability_scores,
)
from ..ops.postprocess import pack_mask_bits, upsample_mask_logits


def _chunk_size(total: int, cap: int = 64) -> int:
    """Largest divisor of `total` that is <= cap (pass-A chunk length)."""
    c = min(cap, total)
    while total % c:
        c -= 1
    return c


def _build_amg_fn(bundle, out_bucket: int, grid: int, max_masks: int,
                  prenms: int, chunk: int, refine: bool = False):
    cfg = bundle.cfg
    L = cfg.mask_input_size  # low-res mask side (image_size / 4)

    def decode3(params, emb, pt):
        """One positive-point prompt -> (3, L, L) token-1..3 logits, (3,) iou."""
        pc = jnp.stack([pt, jnp.zeros_like(pt)], axis=0)[None]  # (1, 2, 2)
        pl = jnp.array([[1.0, -1.0]], jnp.float32)
        m, iou = sam_lib.decode_masks(params, cfg, emb, pc, pl,
                                      multimask=True)
        # The reference consumes decoder tokens 1..3 (segmentation.cpp:166).
        return m[0, 1:4], iou[0, 1:4]

    def run(params, emb, sizes, thr):
        # sizes: (orig_h, orig_w, crop_h, crop_w) i32
        # thr:   (iou_t, stability_t, nms_t, min_area_frac, max_area_frac,
        #         min_region_area_lowres) f32
        crop_h, crop_w = sizes[2], sizes[3]
        pts = point_grid(grid, crop_w, crop_h)  # (G, 2) in model-input px
        # Low-res validity of the un-padded region: pixel centres of the
        # L-grid that fall inside the resize-longest-side crop.  Keeps
        # padding junk out of every area/stability/box statistic.
        centre = (jnp.arange(L, dtype=jnp.float32) + 0.5) * (cfg.image_size / L)
        valid = ((centre[:, None] < crop_h.astype(jnp.float32))
                 & (centre[None, :] < crop_w.astype(jnp.float32)))

        def chunk_stats(pts_c):  # (C, 2)
            m, iou = jax.vmap(lambda p: decode3(params, emb, p))(pts_c)
            binary = (m > 0) & valid
            area = binary.sum(axis=(-1, -2)).astype(jnp.float32)
            stab = stability_scores(m, valid)
            boxes = mask_boxes(binary)
            return iou, stab, area, boxes

        pts_chunks = pts.reshape(-1, chunk, 2)
        iou, stab, area, boxes = lax.map(chunk_stats, pts_chunks)
        iou = iou.reshape(-1)
        stab = stab.reshape(-1)
        area = area.reshape(-1)
        boxes = boxes.reshape(-1, 4)

        valid_area = valid.sum().astype(jnp.float32)
        ok = ((iou >= thr[0]) & (stab >= thr[1])
              & (area >= jnp.maximum(thr[3] * valid_area, 1.0))
              & (area <= thr[4] * valid_area))
        score = jnp.where(ok, iou, -1.0)

        # Pre-NMS pool: top-P by score (P static — ties among the -1
        # invalids are irrelevant, they can never be kept).
        sc_p, idx_p = lax.top_k(score, prenms)
        keep = greedy_nms(boxes[idx_p], sc_p, thr[2])
        sc_k = jnp.where(keep, sc_p, -1.0)
        sc_f, j = lax.top_k(sc_k, max_masks)
        win = idx_p[j]                      # (K,) ids into the 3*G candidates
        pt_id = win // 3
        tok = win % 3

        # Pass B: re-decode only the winners; select each one's token.
        # NUMERICS NOTE (advisor r4): pass B's flat-vmap program may fuse
        # differently from pass A's chunked lax.map, so in bf16 a winner's
        # re-decoded logits can drift slightly from the statistics that
        # selected it. `tpu_microbench amg` measures the A/B drift on chip
        # (max |logit delta| over winners); CPU f32 is exact.
        m3 = jax.vmap(lambda p: decode3(params, emb, p)[0])(pts[pt_id])
        m = jnp.take_along_axis(m3, tok[:, None, None, None], axis=1)[:, 0]
        if refine:
            # min_mask_region_area post-filter (upstream
            # postprocess_small_regions; ops/amg.refine_mask_logits).
            # Static build flag: the two component labelings per mask are
            # only paid when the caller asked for the filter.
            m = jax.vmap(lambda ml: refine_mask_logits(ml, valid, thr[5]))(m)
        logits = upsample_mask_logits(m[None], out_bucket, cfg.image_size,
                                      sizes[0], sizes[1], crop_h, crop_w)
        # Flat 1-D packed output — the serving layout rule
        # (runtime/segmentation.py _build_decode_fn).
        packed = pack_mask_bits(logits)[0].reshape(-1)
        return packed, sc_f, stab[win], area[win]

    return jax.jit(run)


def _prenms_pool(G: int, max_masks: int) -> int:
    """Pre-NMS pool size for a grid of G points (3G candidates).

    The pool covers at least 3/4 of all candidates (advisor r4: a fixed
    256-cap silently truncated permissive-threshold runs at grid 32, where
    only the top 256 of 3072 entered NMS), floored at 256 and at 4x the
    requested winner count so small grids and large K always have slack.
    """
    return min(3 * G, max(256, 3 * G * 3 // 4, 4 * max_masks))


def generate_masks(seg, grid: int = 32, max_masks: int = 64,
                   iou_thresh: float = 0.88, stability_thresh: float = 0.95,
                   nms_thresh: float = 0.7, min_area_frac: float = 0.0,
                   max_area_frac: float = 1.0,
                   min_mask_region_area: int = 0) -> List:
    """Segment everything: List[Mask], best-first (see Segmentation method).

    `min_mask_region_area` (original-image pixels, like upstream's
    parameter of the same name) enables the on-device small-region
    post-filter on the winners: holes below the area are filled, islands
    below it removed (ops/amg.refine_mask_logits).

    Candidate pool: only the top `_prenms_pool(G, K)` candidates by score
    enter NMS (>= 3/4 of all candidates — see _prenms_pool). Masks whose
    PREDICTED IoU is <= 0 are always discarded, even with iou_thresh <= 0
    (the score<=0 validity gate; see ops/amg.greedy_nms docstring).
    """
    from .segmentation import Mask
    from ..ops.preprocess import pick_bucket
    from ..ops.postprocess import unpack_mask_bits

    env = seg._env
    bundle = env.sam_model(seg._variant)
    bucket = pick_bucket(seg._original)
    G = grid * grid
    chunk = _chunk_size(G)
    # K cannot exceed the candidate pool (top_k k <= array length), and the
    # pre-NMS pool must hold at least K winners.
    max_masks = min(max_masks, 3 * G)
    prenms = _prenms_pool(G, max_masks)
    refine = min_mask_region_area > 0
    # Traced threshold in LOW-RES pixels: orig px -> model-input px is
    # seg._scale, model-input -> low-res grid is L / image_size.
    cfg = bundle.cfg
    lr_factor = seg._scale * cfg.mask_input_size / cfg.image_size
    min_area_lr = float(min_mask_region_area) * lr_factor * lr_factor
    fn = env.executable(
        ("amg", seg._variant, bucket, grid, max_masks, prenms, refine),
        lambda: _build_amg_fn(bundle, bucket, grid, max_masks, prenms,
                              chunk, refine))
    sizes = env.sizes_on_device((seg._original.height, seg._original.width,
                                 seg._crop[0], seg._crop[1]))
    thr = env.floats_on_device((iou_thresh, stability_thresh, nms_thresh,
                                min_area_frac, max_area_frac, min_area_lr))
    packed, score, stab, area = jax.device_get(
        fn(bundle.params, seg._embedding, sizes, thr))
    packed = packed.reshape(-1, bucket, bucket // 8)
    mask_u8 = unpack_mask_bits(packed[:, :seg._original.height, :], bucket)
    out = []
    for i in range(max_masks):
        if score[i] <= 0.0:
            break  # scores are sorted descending; the rest are invalid
            # pads OR masks the decoder itself rated <= 0 (see docstring)
        out.append(Mask(seg._to_mask_image(mask_u8[i]), float(score[i])))
    return out


# --------------------------------------------------------------- crop layer


def crop_boxes(extent, n_layers: int, overlap_ratio: float) -> List[Tuple]:
    """Crop windows for multi-crop generation: [(x0, y0, x1, y1, layer)].

    Mirrors upstream SamAutomaticMaskGenerator's generate_crop_boxes:
    layer 0 is the full image; layer i tiles the image with 2^i crops per
    side, each overlapping its neighbour by
    int(overlap_ratio * min(W, H) * 2 / n_per_side) pixels.
    """
    import math

    w, h = extent.width, extent.height
    boxes = [(0, 0, w, h, 0)]
    short = min(w, h)
    for layer in range(1, n_layers + 1):
        n = 2 ** layer
        overlap = int(overlap_ratio * short * (2.0 / n))
        cw = int(math.ceil((overlap * (n - 1) + w) / n))
        ch = int(math.ceil((overlap * (n - 1) + h) / n))
        x0s = [int((cw - overlap) * i) for i in range(n)]
        y0s = [int((ch - overlap) * i) for i in range(n)]
        for y0 in y0s:
            for x0 in x0s:
                boxes.append((x0, y0, min(x0 + cw, w), min(y0 + ch, h),
                              layer))
    return boxes


def _host_box(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.array([0.0, 0.0, -1.0, -1.0], np.float32)
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)


def _host_nms(boxes: np.ndarray, order: np.ndarray, thresh: float
              ) -> np.ndarray:
    """Greedy box NMS over `order` (preference-descending indices) -> bool
    keep per original index. Inclusive-pixel IoU, matching ops/amg."""
    keep = np.ones(len(boxes), bool)
    area = (np.maximum(boxes[:, 2] - boxes[:, 0] + 1, 0)
            * np.maximum(boxes[:, 3] - boxes[:, 1] + 1, 0))
    for rank, i in enumerate(order):
        if not keep[i]:
            continue
        for j in order[rank + 1:]:
            if not keep[j]:
                continue
            iw = max(min(boxes[i, 2], boxes[j, 2])
                     - max(boxes[i, 0], boxes[j, 0]) + 1, 0)
            ih = max(min(boxes[i, 3], boxes[j, 3])
                     - max(boxes[i, 1], boxes[j, 1]) + 1, 0)
            inter = iw * ih
            union = max(area[i] + area[j] - inter, 1.0)
            if inter / union > thresh:
                keep[j] = False
    return keep


def generate_masks_image(img, env, variant=None, grid: int = 32,
                         max_masks: int = 64, iou_thresh: float = 0.88,
                         stability_thresh: float = 0.95,
                         nms_thresh: float = 0.7, min_area_frac: float = 0.0,
                         max_area_frac: float = 1.0,
                         min_mask_region_area: int = 0,
                         crop_n_layers: int = 0,
                         crop_overlap_ratio: float = 512 / 1500,
                         crop_points_downscale: int = 1,
                         crop_nms_thresh: float = 0.7) -> List:
    """Segment everything with optional multi-crop refinement.

    `crop_n_layers=0` is exactly Segmentation.process + generate_masks.
    With `crop_n_layers >= 1` (upstream SamAutomaticMaskGenerator's
    crop_n_layers), layer i additionally tiles the image into 2^i x 2^i
    overlapping crops; each crop is embedded and mask-generated
    independently (one encoder pass per crop — same cost model as
    upstream), its grid downscaled by crop_points_downscale^i (upstream
    crop_n_points_downscale_factor), and the union is deduplicated by a
    host-side cross-crop greedy box NMS that PREFERS masks from smaller
    crops (upstream scores crops by 1/area), threshold `crop_nms_thresh`.

    Returns List[Mask] at the FULL image extent, best-first by predicted
    IoU, capped at max_masks.
    """
    from .segmentation import Mask, Segmentation
    from ..types import Channels, Extent
    from ..types import Image as _Image, ImageView as _ImageView

    view = img.view() if isinstance(img, _Image) else img
    W, H = view.extent.width, view.extent.height
    kw = dict(max_masks=max_masks, iou_thresh=iou_thresh,
              stability_thresh=stability_thresh, nms_thresh=nms_thresh,
              min_area_frac=min_area_frac, max_area_frac=max_area_frac,
              min_mask_region_area=min_mask_region_area)
    entries = []  # (full mask u8, accuracy, crop area)
    for (x0, y0, x1, y1, layer) in crop_boxes(view.extent, crop_n_layers,
                                              crop_overlap_ratio):
        g = max(1, grid // (crop_points_downscale ** layer))
        if (x0, y0, x1, y1) == (0, 0, W, H):
            sub = view
        else:
            sub = _ImageView.from_array(
                np.ascontiguousarray(view.pixels[y0:y1, x0:x1]),
                view.channels)
        seg = Segmentation.process(sub, env, variant)
        for mk in generate_masks(seg, grid=g, **kw):
            full = np.zeros((H, W), np.uint8)
            full[y0:y1, x0:x1] = np.asarray(mk.image.pixels).reshape(
                y1 - y0, x1 - x0)
            entries.append((full, mk.accuracy, (x1 - x0) * (y1 - y0)))
    if not entries:
        return []
    if crop_n_layers >= 1 and len(entries) > 1:
        boxes = np.stack([_host_box(e[0] > 0) for e in entries])
        # Preference: smaller crop first (1/area descending), insertion
        # order breaks ties — upstream's torchvision.nms(scores=1/area).
        crop_area = np.array([e[2] for e in entries], np.float64)
        order = np.argsort(crop_area, kind="stable")
        keep = _host_nms(boxes, order, crop_nms_thresh)
        entries = [e for e, k in zip(entries, keep) if k]
    entries.sort(key=lambda e: -e[1])
    return [Mask(_Image(Extent(W, H), Channels.mask, e[0]), float(e[1]))
            for e in entries[:max_masks]]
