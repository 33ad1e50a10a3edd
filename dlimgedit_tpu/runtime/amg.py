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
                  prenms: int, chunk: int):
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
        # thr:   (iou_t, stability_t, nms_t, min_area_frac, max_area_frac) f32
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
        m3 = jax.vmap(lambda p: decode3(params, emb, p)[0])(pts[pt_id])
        m = jnp.take_along_axis(m3, tok[:, None, None, None], axis=1)[:, 0]
        logits = upsample_mask_logits(m[None], out_bucket, cfg.image_size,
                                      sizes[0], sizes[1], crop_h, crop_w)
        # Flat 1-D packed output — the serving layout rule
        # (runtime/segmentation.py _build_decode_fn).
        packed = pack_mask_bits(logits)[0].reshape(-1)
        return packed, sc_f, stab[win], area[win]

    return jax.jit(run)


def generate_masks(seg, grid: int = 32, max_masks: int = 64,
                   iou_thresh: float = 0.88, stability_thresh: float = 0.95,
                   nms_thresh: float = 0.7, min_area_frac: float = 0.0,
                   max_area_frac: float = 1.0) -> List:
    """Segment everything: List[Mask], best-first (see Segmentation method)."""
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
    prenms = min(3 * G, max(256, 4 * max_masks))
    fn = env.executable(
        ("amg", seg._variant, bucket, grid, max_masks, prenms),
        lambda: _build_amg_fn(bundle, bucket, grid, max_masks, prenms,
                              chunk))
    sizes = env.sizes_on_device((seg._original.height, seg._original.width,
                                 seg._crop[0], seg._crop[1]))
    thr = env.floats_on_device((iou_thresh, stability_thresh, nms_thresh,
                                min_area_frac, max_area_frac))
    packed, score, stab, area = jax.device_get(
        fn(bundle.params, seg._embedding, sizes, thr))
    packed = packed.reshape(-1, bucket, bucket // 8)
    mask_u8 = unpack_mask_bits(packed[:, :seg._original.height, :], bucket)
    out = []
    for i in range(max_masks):
        if score[i] <= 0.0:
            break  # scores are sorted descending; the rest are invalid pads
        out.append(Mask(seg._to_mask_image(mask_u8[i]), float(score[i])))
    return out
