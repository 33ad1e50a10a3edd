"""Worker process for tests/test_multihost.py — NOT collected by pytest.

Each worker joins a real 2-process jax.distributed runtime on CPU (4 virtual
devices per process, Gloo cross-process collectives — the hermetic stand-in
for a 2-host TPU pod with DCN between hosts, SURVEY.md §4's hardware-free
tier). It then exercises the two multi-host paths:

  1. dp×tp inference: `encode_frames` on the global mesh (tp inside the
     process = ICI analog; dp across processes = DCN analog, zero cross-host
     collectives), checked for parity against a single-device encode of the
     full deterministic batch that every rank can recompute locally.
  2. dp training: one sharded train step — the gradient psum crosses
     processes; both ranks must observe the identical loss.
  3. multi-host checkpoint/resume: a collective orbax save of the sharded
     train state and a sharding-preserving restore, byte-exact per shard.

Prints MULTIHOST-OK on success; any assertion kills the worker and fails
the spawning test.
"""

import sys

REPO = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> int:
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    import jax
    import jax.numpy as jnp

    from dlimgedit_tpu.models import sam as sam_lib
    from dlimgedit_tpu.parallel.batch import encode_frames
    from dlimgedit_tpu.parallel.multihost import (
        global_mesh,
        initialize,
        local_rows,
        process_local_batch,
    )

    initialize(coordinator, num_processes, process_id)
    assert len(jax.devices()) == num_processes * len(jax.local_devices())

    mesh = global_mesh(tp=2)
    # tp groups must be intra-process (ICI rule): every mesh row is one
    # process's devices.
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, mesh.devices

    cfg = sam_lib.make_config("mobile_sam", image_size=64)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)

    # Deterministic global batch every rank can recompute in full.
    B = 8
    rng = np.random.default_rng(7)
    all_frames = rng.standard_normal((B, 64, 64, 3)).astype(np.float32)
    per = B // num_processes
    mine = all_frames[process_id * per:(process_id + 1) * per]

    frames_g = process_local_batch(mesh, mine, B)
    emb_g = encode_frames(params, cfg, frames_g, mesh=mesh)
    got = local_rows(emb_g)

    want = np.asarray(sam_lib.encode_image(
        params, cfg, jnp.asarray(mine, device=jax.local_devices()[0])))
    d_inf = float(np.max(np.abs(got - want)))
    assert got.shape == want.shape and d_inf < 3e-4, (got.shape, d_inf)

    # One dp-sharded train step: the gradient all-reduce crosses processes.
    from dlimgedit_tpu.train.step import (
        TrainConfig,
        init_train_state,
        make_train_step,
        place_train_state,
    )

    L = cfg.mask_input_size
    batch_all = {
        "images": all_frames,
        "point_coords": rng.uniform(0, 64, (B, 2, 2)).astype(np.float32),
        "point_labels": np.tile(np.array([[1.0, -1.0]], np.float32), (B, 1)),
        "masks": (rng.random((B, L, L)) > 0.5).astype(np.float32),
    }
    opt_state = init_train_state(params)
    step = make_train_step(cfg, TrainConfig(), donate=False)
    with mesh:
        # place_train_state device_puts the (host-identical) full batch;
        # each process transfers only its addressable dp shards.
        p, o, batch_d = place_train_state(params, opt_state, batch_all, mesh)
        p2, o2, loss, _ = step(p, o, batch_d)
    loss = float(loss)
    assert np.isfinite(loss)

    # Multi-host checkpoint/resume: every rank calls save (orbax coordinates
    # the collective write over the distributed runtime; each process writes
    # only its addressable shards), then restores into the SAME shardings
    # and must get the bytes back exactly.
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else ""
    if ckpt_dir:
        from dlimgedit_tpu.train.checkpoint import (
            restore_train_state,
            save_train_state,
        )

        save_train_state(ckpt_dir, 1, p2, o2)
        like = {"params": p2, "opt_state": o2, "step": np.int64(0)}
        rp, ro, rstep = restore_train_state(ckpt_dir, like=like)
        assert rstep == 1
        for a, b in zip(jax.tree_util.tree_leaves(rp),
                        jax.tree_util.tree_leaves(p2)):
            sa = sorted(a.addressable_shards, key=lambda s: s.device.id)
            sb = sorted(b.addressable_shards, key=lambda s: s.device.id)
            for x, y in zip(sa, sb):
                assert x.index == y.index
                np.testing.assert_array_equal(np.asarray(x.data),
                                              np.asarray(y.data))

    print(f"MULTIHOST-OK rank={process_id} mesh={dict(mesh.shape)} "
          f"encode_maxd={d_inf:.2e} loss={loss:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
