"""Sequence-parallel single-image encode — cut ViT-H latency with chips.

dp (streaming_frames.py) scales throughput; this example scales the
LATENCY of one image: the encoder's token windows shard across an (sp,)
mesh (`parallel/sp.py`), windowed blocks run with zero communication, and
only the global-attention blocks gather the token stream. The result is
numerically identical to the single-chip encode.

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


if __name__ == "__main__":
    main(*sys.argv[1:2])
