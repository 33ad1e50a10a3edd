"""Interactive segmentation pipeline: embed once, query masks cheaply.

Mirrors SegmentationImpl (/root/reference/src/segmentation.cpp:118-174) with
the TPU-native structure from SURVEY.md §7:

  * `process`     — ONE jitted XLA program: fused preprocess (resize-longest-
                    side + channel map + normalise + pad, ops/preprocess.py)
                    + image encoder. The embedding STAYS ON DEVICE — the
                    Segmentation object is the resumable computation cache
                    (segmentation.hpp:61).
  * `compute_mask`— a second small jitted program: prompt encode + two-way
                    decoder + fused upsample-to-original + threshold
                    (ops/postprocess.py). Only the final uint8 mask canvas
                    crosses back to the host.

Shape discipline: one executable per (variant, canvas bucket) — any image
size reuses a cached compile.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image.resize import resize_longest_side_extent, transform_point
from ..models import sam as sam_lib
from ..ops.connected import largest_component_mask
from ..ops.postprocess import (
    pack_mask_bits,
    unpack_mask_bits,
    upsample_mask_logits,
)
from ..ops.preprocess import (
    join_canvas_parts,
    pack_and_put_canvas,
    pick_bucket,
    resolve_h2d_chunks,
    sam_preprocess,
)
from ..types import Channels, Extent, Image, ImageView, Point, Region
from .environment import Environment


@dataclass
class Mask:
    """A binary mask for a single object (dlimgedit.hpp:140-144)."""

    image: Image
    accuracy: float = 0.0


def _build_embed_fn(bundle, mesh=None):
    """Preprocess + image encoder as one XLA program.

    With `mesh` (Options.scaleout_devices), the encoder runs latency-sharded
    over the ('sp',) axis: ViT variants through the sequence-parallel tier
    (parallel/sp.py — numerically identical shard_map schedule), TinyViT
    through GSPMD canvas-row sharding (the parallel/spatial.py scheme: its
    conv stages and static-window attention partition row-locally with halo
    exchanges). Both return the embedding replicated, so every decode
    program downstream is unchanged."""
    cfg = bundle.cfg

    def run(params, canvas_parts, sizes):
        canvas = join_canvas_parts(canvas_parts)
        x = sam_preprocess(canvas, sizes[0], sizes[1], sizes[2], sizes[3],
                           image_size=cfg.image_size,
                           compute_dtype=bundle.compute_dtype)
        if mesh is not None and cfg.encoder_vit is not None:
            from ..parallel.sp import sam_vit_apply_sp

            emb = sam_vit_apply_sp(params["encoder"], x, cfg.encoder_vit,
                                   mesh)
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, "sp")))
            emb = sam_lib.encode_image(params, cfg, x)
            emb = jax.lax.with_sharding_constraint(
                emb, NamedSharding(mesh, P()))
        else:
            emb = sam_lib.encode_image(params, cfg, x)
        return emb.astype(jnp.float32)

    return jax.jit(run)


def _build_batch_decode_fn(bundle, out_bucket: int,
                           largest_component: bool = False):
    """N prompts against ONE cached embedding in a single XLA program
    (BASELINE config 3: batched multi-point decode).

    `largest_component` mirrors compute_mask's Options.largest_region_object
    semantics per prompt: region prompts are identified INSIDE the program
    by their first label (2.0, the top-left box label — point prompts carry
    1.0), so one executable serves any point/region mix."""
    cfg = bundle.cfg

    def run(params, emb, points, labels, sizes):
        def one(pc, pl_):
            m, iou = sam_lib.decode_masks(params, cfg, emb, pc[None],
                                          pl_[None], multimask=False)
            m0 = m[0]
            if largest_component:
                keep = largest_component_mask(m0[0] > 0)
                is_region = pl_[0] == 2.0
                m0 = jnp.where(is_region & ~keep, -10.0, m0)
            return m0, iou[0]

        masks, iou = jax.vmap(one)(points, labels)  # (N, 1, L, L)
        logits = upsample_mask_logits(masks[:, 0][None], out_bucket,
                                      cfg.image_size, sizes[0], sizes[1],
                                      sizes[2], sizes[3])
        # 1-D output: see _build_decode_fn for the layout rule.
        return pack_mask_bits(logits)[0].reshape(-1), iou[:, 0]

    return jax.jit(run)


def _build_decode_fn(bundle, out_bucket: int, multimask: bool,
                     largest_component: bool):
    cfg = bundle.cfg

    def run(params, emb, points, labels, sizes):
        masks, iou = sam_lib.decode_masks(params, cfg, emb, points, labels,
                                          multimask=multimask)
        if multimask:
            # The reference consumes decoder tokens 1..3
            # (segmentation.cpp:166-173).
            masks = masks[:, 1:4]
            iou = iou[:, 1:4]
        if largest_component:
            def keep_largest(m):
                keep = largest_component_mask(m > 0)
                return jnp.where(keep, m, -10.0)

            masks = jax.vmap(jax.vmap(keep_largest))(masks)
        logits = upsample_mask_logits(masks, out_bucket, cfg.image_size,
                                      sizes[0], sizes[1], sizes[2], sizes[3])
        # Bit-pack on device: the D2H payload is 8x smaller (fetch-RPC bound
        # on remote-attached TPUs); the host unpacks with np.unpackbits.
        #
        # The packed canvas is returned FLATTENED (1-D). The natural shape
        # (M, bucket, bucket/8) has a minor dim < the 128-byte lane tile for
        # buckets < 1024, and XLA's layout assignment then emits the buffer
        # column-major; jax's fetch de-permutes, but the PJRT serving shim's
        # raw ToHostBuffer copy does not (old plugins copy device order),
        # which transposed every 512-bucket mask byte-for-byte. A 1-D output
        # has exactly one dense layout, making the raw copy well-defined
        # everywhere; hosts reshape with the bucket they already know.
        return pack_mask_bits(logits)[0].reshape(-1), iou[0]

    return jax.jit(run)


class Segmentation:
    """Holds a processed image embedding; queries masks for prompts
    (dlimgedit.hpp:138-168)."""

    def __init__(self, env: Environment, variant: str, embedding,
                 original: Extent, scale: float, crop: Tuple[int, int]):
        self._env = env
        self._variant = variant
        self._embedding = embedding  # (1, He, We, C) f32, on device
        self._original = original
        self._scale = scale
        self._crop = crop  # (crop_h, crop_w) = resize-longest-side extent

    # -- construction ---------------------------------------------------------

    @staticmethod
    def process(img: Union[Image, ImageView], env: Environment,
                variant: Optional[str] = None) -> "Segmentation":
        """Embed an image (the expensive step; hot path #1, SURVEY.md §3.2)."""
        view = img.view() if isinstance(img, Image) else img
        variant = variant or env.options.sam_variant
        bundle = env.sam_model(variant)
        cfg = bundle.cfg
        extent = view.extent
        target, scale = resize_longest_side_extent(extent, cfg.image_size)
        # Pooled staging canvases skip the 3 MB zeroing per call; safe off
        # CPU only (see ops/preprocess.staging_canvas for the aliasing rule).
        pooled = env.device.platform != "cpu"
        if env.options.preprocess_mode == "host":
            # Reference-exact numerics: stb-semantics resize on the host
            # (image.cpp:37-51 via segmentation.cpp:60-70); the device
            # resample becomes an exact identity over the valid region.
            from ..image.resize import resize as host_resize

            if target != extent:
                view = host_resize(view, target).view()
            extent_in = view.extent
            # Bucket by the RESIZED extent: the embed canvas only holds the
            # host-resized (<= image_size) image — the mask-coverage bucket
            # is the DECODE bucket, derived independently from the original
            # extent in _decode. Bucketing by the original here staged a
            # 4096-bucket (48 MB) canvas for a 4000 px input and compiled a
            # whole extra embed executable.
            bucket = pick_bucket(extent_in)
            sizes = (extent_in.height, extent_in.width,
                     target.height, target.width)
        else:
            bucket = pick_bucket(extent)
            sizes = (extent.height, extent.width,
                     target.height, target.width)
        embed = env.executable(("embed", variant, bucket),
                               lambda: _build_embed_fn(bundle, env.mesh))
        # Pack + H2D, pipelined per row chunk where the DMA is real
        # (resolve_h2d_chunks; single put on CPU / through the relay).
        parts, _ = pack_and_put_canvas(
            view, bucket, env.put_target, pooled=pooled,
            n_chunks=resolve_h2d_chunks(env.options.h2d_overlap_chunks,
                                        env.device.platform))
        emb = embed(bundle.params, parts, env.sizes_on_device(sizes))
        return Segmentation(env, variant, emb, extent, scale,
                            (target.height, target.width))

    # -- queries ---------------------------------------------------------------

    @property
    def extent(self) -> Extent:
        return self._original

    @property
    def embedding(self):
        """The on-device image embedding (1, He, We, C)."""
        return self._embedding

    def _prompt_arrays(self, point: Optional[Point], region: Optional[Region]):
        """Build the 2-point prompt protocol (segmentation.cpp:131-152)."""
        points = np.zeros((1, 2, 2), np.float32)
        labels = np.zeros((1, 2), np.float32)
        if point is not None:
            x, y = transform_point(point.x, point.y, self._scale)
            points[0, 0] = (x, y)
            labels[0, 0] = 1.0
            points[0, 1] = (0.0, 0.0)
            labels[0, 1] = -1.0
        else:
            assert region is not None
            tlx, tly = transform_point(region.top_left.x, region.top_left.y,
                                       self._scale)
            brx, bry = transform_point(region.bottom_right.x,
                                       region.bottom_right.y, self._scale)
            points[0, 0] = (tlx, tly)
            labels[0, 0] = 2.0
            points[0, 1] = (brx, bry)
            labels[0, 1] = 3.0
        return points, labels

    def _decode(self, point: Optional[Point], region: Optional[Region],
                multimask: bool, largest_component: bool = False):
        env = self._env
        bundle = env.sam_model(self._variant)
        bucket = pick_bucket(self._original)
        points, labels = self._prompt_arrays(point, region)
        sizes = env.sizes_on_device((self._original.height,
                                     self._original.width,
                                     self._crop[0], self._crop[1]))
        decode = env.executable(
            ("decode", self._variant, bucket, multimask, largest_component),
            lambda: _build_decode_fn(bundle, bucket, multimask,
                                     largest_component))
        # ONE device_get for both outputs: through remote-attached TPUs every
        # D2H fetch is a ~tens-of-ms RPC, so fetch count AND payload size
        # dominate latency. The device ships bit-packed rows (bucket^2/8
        # bytes); unpack only the valid rows here.
        packed, iou = jax.device_get(
            decode(bundle.params, self._embedding, points, labels, sizes))
        packed = packed.reshape(-1, bucket, bucket // 8)
        mask_u8 = unpack_mask_bits(packed[:, :self._original.height, :],
                                   bucket)
        return mask_u8, iou

    def _to_mask_image(self, mask_canvas: np.ndarray) -> Image:
        h, w = self._original.height, self._original.width
        return Image(self._original, Channels.mask, mask_canvas[:h, :w])

    def compute_mask(self, prompt: Union[Point, Region],
                     largest_component: Optional[bool] = None) -> Image:
        """Single best mask for a point or region prompt.

        For Region prompts, `largest_component` (default: the environment's
        option) keeps only the largest connected object inside the box — the
        north-star extension over the reference's raw box prompt."""
        is_region = isinstance(prompt, Region)
        if largest_component is None:
            largest_component = (is_region
                                 and self._env.options.largest_region_object)
        masks, _ = self._decode(
            None if is_region else prompt,
            prompt if is_region else None,
            multimask=False, largest_component=largest_component)
        return self._to_mask_image(masks[0])

    def compute_masks(self, point: Point) -> List[Mask]:
        """Three candidate masks with confidences (dlimgedit.hpp:152-157)."""
        masks, iou = self._decode(point, None, multimask=True)
        return [Mask(self._to_mask_image(masks[i]), float(iou[i]))
                for i in range(3)]

    def compute_mask_batch(self, prompts: List[Union[Point, Region]]
                           ) -> List[Mask]:
        """Decode MANY prompts against the cached embedding in one XLA
        program (one dispatch + one fetch; BASELINE config 3). Returns the
        single best mask per prompt. Prompt count is padded to a power of two
        so executables are reused across batch sizes."""
        env = self._env
        bundle = env.sam_model(self._variant)
        n = len(prompts)
        if n == 0:
            return []
        padded = 1
        while padded < n:
            padded *= 2
        points = np.zeros((padded, 2, 2), np.float32)
        labels = np.full((padded, 2), -1.0, np.float32)
        for i, pr in enumerate(prompts):
            if isinstance(pr, Region):
                p, l = self._prompt_arrays(None, pr)
            else:
                p, l = self._prompt_arrays(pr, None)
            points[i] = p[0]
            labels[i] = l[0]
        bucket = pick_bucket(self._original)
        sizes = env.sizes_on_device((self._original.height,
                                     self._original.width,
                                     self._crop[0], self._crop[1]))
        lcc = (env.options.largest_region_object
               and any(isinstance(pr, Region) for pr in prompts))
        decode = env.executable(
            ("decode_batch", self._variant, bucket, padded, lcc),
            lambda: _build_batch_decode_fn(bundle, bucket,
                                           largest_component=lcc))
        packed, iou = jax.device_get(
            decode(bundle.params, self._embedding, points, labels, sizes))
        packed = packed.reshape(-1, bucket, bucket // 8)
        mask_u8 = unpack_mask_bits(packed[:, :self._original.height, :],
                                   bucket)
        return [Mask(self._to_mask_image(mask_u8[i]), float(iou[i]))
                for i in range(n)]

    def generate_masks(self, grid: int = 32, max_masks: int = 64,
                       iou_thresh: float = 0.88,
                       stability_thresh: float = 0.95,
                       nms_thresh: float = 0.7,
                       min_area_frac: float = 0.0,
                       max_area_frac: float = 1.0,
                       min_mask_region_area: int = 0) -> List[Mask]:
        """Segment everything: masks for all objects, best-first.

        The upstream-SAM automatic mask generator (point grid -> multimask
        decode -> IoU/stability filtering -> greedy box NMS) reworked as one
        XLA program against the cached embedding — one dispatch, one fetch
        (runtime/amg.py; the reference has no counterpart).  Thresholds are
        traced scalars: tuning them reuses the compiled executable.

        grid: points per side of the prompt grid (grid^2 prompts, 3
        candidate masks each).  max_masks: static output slots; fewer may
        return.  Masks are sorted by predicted IoU (Mask.accuracy).
        min_mask_region_area (original-image px, upstream's parameter):
        fill holes / drop islands smaller than this, on device.  For
        multi-crop generation (upstream crop_n_layers) use the
        module-level generate_masks_image — it needs the pixels, which a
        Segmentation no longer holds."""
        from .amg import generate_masks as _amg

        return _amg(self, grid=grid, max_masks=max_masks,
                    iou_thresh=iou_thresh,
                    stability_thresh=stability_thresh,
                    nms_thresh=nms_thresh, min_area_frac=min_area_frac,
                    max_area_frac=max_area_frac,
                    min_mask_region_area=min_mask_region_area)


def segment_objects(img: Union[Image, ImageView], env: Environment) -> Image:
    """Dichotomous foreground segmentation (BiRefNet; dlimgedit.hpp:170-173)."""
    from .birefnet import birefnet_segment

    view = img.view() if isinstance(img, Image) else img
    return birefnet_segment(env, view)
