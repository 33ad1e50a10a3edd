"""Checkpoint/resume tests: orbax round-trip of train state + serving export
consumed by the Environment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.train.checkpoint import (
    export_serving_bundle,
    latest_step,
    restore_train_state,
    save_train_state,
)
from dlimgedit_tpu.train.step import init_train_state


@pytest.fixture(scope="module")
def tiny_state():
    cfg = sam_lib.make_config("mobile_sam", image_size=64)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    opt_state = init_train_state(params)
    return cfg, params, opt_state


def test_checkpoint_roundtrip(tmp_path, tiny_state):
    _, params, opt_state = tiny_state
    save_train_state(tmp_path, 7, params, opt_state)
    assert latest_step(tmp_path) == 7
    save_train_state(tmp_path, 12, params, opt_state)
    assert latest_step(tmp_path) == 12

    p2, o2, step = restore_train_state(tmp_path)
    assert step == 12
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(p2)
    assert len(a) == len(b)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_restore_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        restore_train_state(tmp_path / "empty")


def test_export_serving_bundle_loads_in_environment(tmp_path, tiny_state):
    from dlimgedit_tpu import Backend, Environment, Extent, Image, Options
    from dlimgedit_tpu import Channels, Point, Segmentation

    _, params, _ = tiny_state
    out = tmp_path / "models" / "segmentation" / "mobile_sam.npz"
    export_serving_bundle(params, out)

    env = Environment(Options(backend=Backend.cpu,
                              model_directory=str(tmp_path / "models"),
                              compute_dtype="float32",
                              sam_image_size=64))
    bundle = env.sam_model("mobile_sam")  # loads from the exported bundle
    rng = np.random.default_rng(0)
    img = Image(Extent(48, 32), Channels.rgb,
                rng.integers(0, 256, (32, 48, 3), dtype=np.uint8))
    seg = Segmentation.process(img, env)
    mask = seg.compute_mask(Point(24, 16))
    assert mask.extent == Extent(48, 32)


def test_bundle_sha256_verification(tmp_path, tiny_state):
    import hashlib

    from dlimgedit_tpu import Backend, Environment, Options
    from dlimgedit_tpu.errors import DlimgError
    from dlimgedit_tpu.train.checkpoint import export_serving_bundle

    _, params, _ = tiny_state
    out = tmp_path / "models" / "segmentation" / "mobile_sam.npz"
    export_serving_bundle(params, out)
    good = hashlib.sha256(out.read_bytes()).hexdigest()

    # Correct pin loads fine.
    (out.parent / "mobile_sam.npz.sha256").write_text(good + "\n")
    env = Environment(Options(backend=Backend.cpu,
                              model_directory=str(tmp_path / "models"),
                              compute_dtype="float32", sam_image_size=64))
    env.sam_model("mobile_sam")

    # Corrupted pin raises.
    (out.parent / "mobile_sam.npz.sha256").write_text("0" * 64 + "\n")
    env2 = Environment(Options(backend=Backend.cpu,
                               model_directory=str(tmp_path / "models"),
                               compute_dtype="float32", sam_image_size=64))
    import pytest as _pytest
    with _pytest.raises(DlimgError):
        env2.sam_model("mobile_sam")
