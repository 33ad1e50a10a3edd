"""Single-image latency scale-out — cut per-image latency with chips.

dp (streaming_frames.py) scales throughput; this example scales the
LATENCY of one image, on both workloads:

  * SAM ViT encode: the encoder's token windows shard across an (sp,)
    mesh (`parallel/sp.py`), windowed blocks run with zero communication,
    and only the global-attention blocks gather the token stream.
  * BiRefNet segment_objects: the canvas ROWS shard across the same mesh
    (`parallel/spatial.py`); GSPMD keeps convs/window attention row-local
    with halo exchanges — the axis that matters for the high_res tier
    (the slowest program in the library).

Both results are numerically identical to the single-chip path.

Usage:
    python examples/latency_scaleout.py            # vit_b over all chips
    python examples/latency_scaleout.py vit_h
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.parallel.sp import encode_image_sp, make_sp_mesh


def main(variant="vit_b", image_size=1024, devices=None, cfg=None,
         params=None):
    """`image_size`/`devices`/`cfg`/`params` are injectable so the test
    suite can execute this example end-to-end at a tiny size
    (test_examples.py); run as a script it uses the full preset."""
    devices = devices if devices is not None else jax.devices()
    mesh = make_sp_mesh(len(devices), devices=devices)
    print(f"sp mesh: {dict(mesh.shape)}")

    if cfg is None:
        cfg = sam_lib.make_config(variant, image_size=image_size)
    if params is None:
        params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (1, cfg.image_size, cfg.image_size, 3)), jnp.float32)

    emb = encode_image_sp(params, cfg, x, mesh=mesh)
    ref = sam_lib.encode_image(params, cfg, x)
    err = float(jnp.abs(emb - ref).max())
    print(f"embedding {emb.shape}; max|sp - single| = {err:.2e}")
    assert err < 1e-4
    return emb


def main_birefnet(image_size=None, devices=None, bcfg=None, bparams=None):
    """Row-sharded segment_objects over the same 1-D mesh (injectable for
    the hermetic example test, like main)."""
    from dlimgedit_tpu.models import birefnet
    from dlimgedit_tpu.parallel.spatial import (make_spatial_mesh,
                                                segment_image_spatial)

    devices = devices if devices is not None else jax.devices()
    mesh = make_spatial_mesh(len(devices), devices=devices)
    if bcfg is None:
        bcfg = birefnet.BiRefNetConfig(img_size=image_size or 1024)
    if bparams is None:
        bparams = birefnet.init_birefnet(jax.random.PRNGKey(1), bcfg)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(
        (1, bcfg.img_size, bcfg.img_size, 3)), jnp.float32)
    logits = segment_image_spatial(bparams, bcfg, x, mesh)
    ref = birefnet.birefnet_apply(bparams, x, bcfg)
    err = float(jnp.abs(logits - ref).max())
    print(f"birefnet logits {logits.shape}; max|spatial - single| = {err:.2e}")
    assert err < 1e-4
    return logits


if __name__ == "__main__":
    main(*sys.argv[1:2])
    main_birefnet()
