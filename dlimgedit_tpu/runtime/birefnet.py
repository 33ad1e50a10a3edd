"""BiRefNet runtime: dichotomous foreground segmentation.

Mirrors BiRefNet::segment (/root/reference/src/segmentation.cpp:221-270):
kind escalation (>1536 px -> high-res, :222-225), resize to model resolution,
ImageNet normalise (:232-233), forward, sigmoid -> uint8, box-filter resize
back to the original extent (image.cpp:53-62).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ModelNotFoundError
from ..image.resize import resize_mask
from ..models.common import cast_tree
from ..ops.postprocess import sigmoid_to_u8
from ..ops.preprocess import (join_canvas_parts, pack_and_put_canvas,
                              pick_bucket, resolve_h2d_chunks)
from ..ops.resample import apply_resample, resample_matrix
from ..types import Channels, Image, ImageView
from ..utils.pytree_io import load_pytree

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

BIREFNET_BUNDLES = {
    # Preference-ordered fallback like select_birefnet_model
    # (segmentation.cpp:179-207).
    "general": ("birefnet_general.npz", "birefnet_hr.npz"),
    "high_res": ("birefnet_hr.npz", "birefnet_general.npz"),
}
BIREFNET_RESOLUTION = {"general": 1024, "high_res": 2048}


class BiRefNetBundle:
    def __init__(self, cfg, params, device, compute_dtype, resolution: int):
        from ..models.birefnet import BiRefNetConfig  # noqa: F401

        self.cfg = cfg
        self.resolution = resolution
        self.params = jax.device_put(cast_tree(params, compute_dtype), device)
        self.compute_dtype = compute_dtype


def load_birefnet(env, kind: str) -> BiRefNetBundle:
    from ..models.birefnet import BiRefNetConfig, init_birefnet

    import os

    resolution = int(os.environ.get("DLIMG_BIREFNET_RESOLUTION",
                                    BIREFNET_RESOLUTION[kind]))
    cfg = BiRefNetConfig(
        img_size=resolution,
        deform_int8_gather=env.options.birefnet_int8_deform)
    for name in BIREFNET_BUNDLES[kind]:
        path = env.model_directory / "segmentation" / name
        if path.exists():
            return BiRefNetBundle(cfg, load_pytree(path), env.put_target,
                                  env.compute_dtype, resolution)
    if env.options.allow_random_weights:
        if os.environ.get("DLIMG_BIREFNET_TEST_SLIM") == "1":
            # Hermetic-test shortcut: a narrow Swin + slim decoder keeps the
            # (random-weights) pipeline smoke tests fast on CPU. Production
            # bundles always use the full config above.
            from ..models.swin import SwinConfig

            cfg = BiRefNetConfig(
                img_size=resolution,
                deform_int8_gather=env.options.birefnet_int8_deform,
                swin_cfg=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                                    num_heads=(2, 2, 2, 2), window=4),
                dec_inter_channels=8, aspp_channelster=12, gdt_channels=4,
                aspp_kernel_sizes=(1, 3))
        params = init_birefnet(jax.random.PRNGKey(0), cfg)
        return BiRefNetBundle(cfg, params, env.put_target, env.compute_dtype,
                              resolution)
    raise ModelNotFoundError(
        f"Could not find any BiRefNet model in {env.model_directory}")


def _build_birefnet_fn(bundle: BiRefNetBundle, bucket: int, mesh=None):
    from ..models.birefnet import birefnet_apply

    cfg = bundle.cfg
    S = cfg.img_size

    def run(params, canvas_parts, sizes):
        # Fused: dynamic resize to model resolution + ImageNet normalise.
        img = join_canvas_parts(canvas_parts).astype(jnp.float32) / 255.0
        R = resample_matrix(S, bucket, S, sizes[0], antialias=True)
        C = resample_matrix(S, bucket, S, sizes[1], antialias=True)
        x = apply_resample(R, C, img)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = ((x - mean) / std)[None].astype(bundle.compute_dtype)
        if mesh is not None:
            # Latency scale-out (Options.scaleout_devices): canvas rows over
            # the ('sp',) axis, GSPMD halo exchanges for convs / Swin window
            # attention — the parallel/spatial.py scheme inlined into the
            # serving program so the resize+normalise fusion stays intact.
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, "sp")))
            logits = birefnet_apply(params, x, cfg)  # (1, S, S, 1)
            logits = jax.lax.with_sharding_constraint(
                logits, NamedSharding(mesh, P()))
        else:
            logits = birefnet_apply(params, x, cfg)  # (1, S, S, 1)
        return sigmoid_to_u8(logits[0, :, :, 0])

    return jax.jit(run)


def birefnet_segment(env, view: ImageView) -> Image:
    """segment_objects implementation (dlimgedit.hpp:170-173)."""
    extent = view.extent
    kind = ("high_res" if extent.width > 1536 or extent.height > 1536
            else "general")
    bundle = env.birefnet_model(kind)
    bucket = pick_bucket(extent)
    sizes = env.sizes_on_device((extent.height, extent.width))
    run = env.executable(("birefnet", kind, bucket),
                         lambda: _build_birefnet_fn(bundle, bucket, env.mesh))
    # Pooled staging canvas off-CPU (no 3 MB zeroing; the resample matrices
    # in _build_birefnet_fn mask everything outside [:h, :w]); pack + H2D
    # pipelined per row chunk where the DMA is real (resolve_h2d_chunks).
    parts, _ = pack_and_put_canvas(
        view, bucket, env.put_target,
        pooled=env.device.platform != "cpu",
        n_chunks=resolve_h2d_chunks(env.options.h2d_overlap_chunks,
                                    env.device.platform))
    mask_model = np.asarray(run(bundle.params, parts, sizes))
    # Box-filter resize back to the original extent (image.cpp:53-62).
    out = resize_mask(ImageView.from_array(mask_model, Channels.mask), extent)
    return Image(extent, Channels.mask, out)
