"""Streaming-frame embedding over a TPU mesh (BASELINE config 5).

Embeds batches of frames data-parallel over all available chips (tensor-
parallel weights for the big encoders), feeding them through the
prefetch-to-device loader so the next batch's H2D transfer rides under the
current batch's encode — the production video/burst pattern — then runs
interactive mask edits against each cached per-frame embedding.

Usage:
    python examples/streaming_frames.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.models.common import cast_tree
from dlimgedit_tpu.parallel.batch import decode_prompt_batch, encode_frames
from dlimgedit_tpu.parallel.mesh import make_mesh
from dlimgedit_tpu.train.data import prefetch_to_device


def main(image_size=256, devices=None):
    """`image_size`/`devices` are injectable so the test suite can execute
    this example end-to-end at a tiny size (test_examples.py)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mesh = make_mesh(n, devices=devices)
    print(f"mesh: {dict(mesh.shape)} over {n} devices")

    cfg = sam_lib.make_config("mobile_sam", image_size=image_size)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)

    # A "video" stream: chunks of B frames, preprocessed (see
    # ops/preprocess for real inputs), prefetched dp-sharded onto the mesh.
    B = mesh.shape["dp"] * 2
    rng = np.random.default_rng(0)
    stream = (rng.standard_normal((B, image_size, image_size, 3))
              .astype(np.float32) for _ in range(3))
    embeddings = None
    for chunk in prefetch_to_device(stream, depth=2, mesh=mesh):
        embeddings = encode_frames(params, cfg, chunk, mesh=mesh)
    print("embeddings:", embeddings.shape, "sharding:", embeddings.sharding)

    # Interactive edits on frame 0: many prompts, one program.
    coords = jnp.asarray(rng.uniform(0, image_size, (6, 2, 2)), jnp.float32)
    labels = jnp.tile(jnp.asarray([[1.0, -1.0]], jnp.float32), (6, 1))
    masks, iou = decode_prompt_batch(params, cfg, embeddings[:1], coords,
                                     labels)
    print("masks:", masks.shape, "predicted IoU:", np.asarray(iou[:, 0]))


if __name__ == "__main__":
    main()
