"""Input-pipeline tests: host->device prefetch (train/data.py)."""

import numpy as np
import pytest

import jax

from dlimgedit_tpu.parallel.mesh import make_mesh
from dlimgedit_tpu.train.data import prefetch_to_device, sam_batch_iterator


def _host_batches(n):
    for i in range(n):
        yield {"x": np.full((4, 3), i, np.float32),
               "y": np.arange(4, dtype=np.int32) + 10 * i}


def test_prefetch_preserves_order_and_content():
    got = list(prefetch_to_device(_host_batches(5), depth=2))
    assert len(got) == 5
    for i, b in enumerate(got):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      np.full((4, 3), i, np.float32))
        np.testing.assert_array_equal(np.asarray(b["y"]),
                                      np.arange(4, dtype=np.int32) + 10 * i)


def test_prefetch_keeps_depth_batches_in_flight():
    pulled = []

    def tracked(n):
        for i in range(n):
            pulled.append(i)
            yield {"x": np.full((2,), i, np.float32)}

    it = prefetch_to_device(tracked(6), depth=3)
    first = next(it)
    # Yielding batch 0 required batches 0..3 to have been dispatched
    # (depth=3 in flight beyond the yielded one).
    assert pulled == [0, 1, 2, 3]
    np.testing.assert_array_equal(np.asarray(first["x"]),
                                  np.zeros(2, np.float32))
    rest = list(it)
    assert len(rest) == 5


def test_prefetch_shorter_than_depth():
    got = list(prefetch_to_device(_host_batches(1), depth=4))
    assert len(got) == 1


def test_prefetch_dp_shards_over_mesh():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = make_mesh(8, dp=8, devices=devs[:8])
    batches = ({"x": np.arange(8, dtype=np.float32).reshape(8, 1) + i}
               for i in range(3))
    for i, b in enumerate(prefetch_to_device(batches, depth=2, mesh=mesh)):
        x = b["x"]
        assert len(x.sharding.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(x), np.arange(8, dtype=np.float32).reshape(8, 1) + i)


def test_sam_batch_iterator_drives_train_step():
    from dlimgedit_tpu.models import sam as sam_lib
    from dlimgedit_tpu.train.step import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    cfg = sam_lib.make_config("mobile_sam", image_size=64)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    opt_state = init_train_state(params)
    step = make_train_step(cfg, TrainConfig(), donate=False)
    rng = np.random.default_rng(0)
    it = sam_batch_iterator(rng, batch_size=2, image_size=64,
                            mask_size=cfg.mask_input_size, steps=2)
    losses = []
    for batch in prefetch_to_device(it, depth=2):
        params, opt_state, loss, _ = step(params, opt_state, batch)
        losses.append(float(loss))
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
