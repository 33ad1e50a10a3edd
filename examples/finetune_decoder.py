"""Fine-tune SAM on a (dp, tp) mesh with checkpointing.

Shows the full training loop: sharded train step (focal+dice+IoU loss),
orbax checkpoints, and export of the trained params as a serving bundle the
Environment loads directly.

Usage:
    python examples/finetune_decoder.py /tmp/ckpts
"""

import sys

import numpy as np
import jax

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.parallel.mesh import make_mesh
from dlimgedit_tpu.train.checkpoint import (
    export_serving_bundle,
    latest_step,
    restore_train_state,
    save_train_state,
)
from dlimgedit_tpu.train.step import (
    TrainConfig,
    init_train_state,
    make_train_step,
    place_train_state,
)


def synthetic_batch(rng, B, img, L):
    return {
        "images": rng.standard_normal((B, img, img, 3)).astype(np.float32),
        "point_coords": rng.uniform(0, img, (B, 2, 2)).astype(np.float32),
        "point_labels": np.tile(np.array([[1.0, -1.0]], np.float32), (B, 1)),
        "masks": (rng.random((B, L, L)) > 0.5).astype(np.float32),
    }


def main(argv=None, bundle_out="models/segmentation/mobile_sam.npz",
         n_steps=5, devices=None):
    """`argv`/`bundle_out`/`n_steps`/`devices` are injectable so the test
    suite can execute this example end-to-end into a tmp dir
    (test_examples.py)."""
    argv = sys.argv[1:] if argv is None else argv
    ckpt_dir = argv[0] if argv else "/tmp/dlimg_ckpts"
    devices = devices if devices is not None else jax.devices()
    mesh = make_mesh(len(devices), devices=devices)
    cfg = sam_lib.make_config("mobile_sam", image_size=64)  # demo-sized
    tcfg = TrainConfig(learning_rate=3e-4)

    if latest_step(ckpt_dir) is not None:
        params, opt_state, step0 = restore_train_state(ckpt_dir)
        print(f"resumed from step {step0}")
    else:
        params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
        opt_state, step0 = init_train_state(params, tcfg), 0

    train_step = make_train_step(cfg, tcfg, donate=False)
    rng = np.random.default_rng(step0)
    B = mesh.shape["dp"] * 2

    with mesh:
        batch = synthetic_batch(rng, B, 64, cfg.mask_input_size)
        params, opt_state, batch = place_train_state(params, opt_state,
                                                     batch, mesh)
        for step in range(step0, step0 + n_steps):
            params, opt_state, loss, aux = train_step(params, opt_state, batch)
            print(f"step {step}: loss {float(loss):.4f} "
                  f"dice {float(aux['dice']):.4f}")

    save_train_state(ckpt_dir, step + 1, jax.device_get(params),
                     jax.device_get(opt_state))
    export_serving_bundle(params, bundle_out)
    print("checkpointed + exported serving bundle")


if __name__ == "__main__":
    main()
