"""Multi-device tests on the 8-virtual-CPU-device mesh (hardware-free tier
of the test strategy, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.parallel.batch import decode_prompt_batch, encode_frames
from dlimgedit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    sam_param_sharding,
)


@pytest.fixture(scope="module")
def cpu8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs[:8]


@pytest.fixture(scope="module")
def small_sam():
    cfg = sam_lib.make_config("mobile_sam", image_size=64)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_make_mesh_factorisation(cpu8):
    mesh = make_mesh(8, devices=cpu8)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh(8, dp=8, devices=cpu8)
    assert mesh.shape == {"dp": 8, "tp": 1}


def test_param_sharding_rules(cpu8, small_sam):
    cfg, params = small_sam
    mesh = make_mesh(8, devices=cpu8)
    shardings = sam_param_sharding(params, mesh)
    qkv = shardings["encoder"]["stages"][1]["blocks"][0]["attn"]["qkv"]["w"]
    assert qkv.spec == jax.sharding.PartitionSpec(None, "tp")
    # Norm scales replicated.
    norm = shardings["encoder"]["neck"]["ln1"]["scale"]
    assert norm.spec == jax.sharding.PartitionSpec()


def test_encode_frames_dp_matches_single_device(cpu8, small_sam):
    cfg, params = small_sam
    mesh = make_mesh(8, dp=8, devices=cpu8)
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((8, 64, 64, 3)).astype(np.float32)
    sharded = encode_frames(params, cfg, jnp.asarray(frames), mesh=mesh)
    single = sam_lib.encode_image(params, cfg, jnp.asarray(frames[:1]))
    np.testing.assert_allclose(np.asarray(sharded[0]), np.asarray(single[0]),
                               atol=2e-4, rtol=1e-3)


def test_encode_frames_tp_matches_single_device(cpu8, small_sam):
    cfg, params = small_sam
    mesh = make_mesh(8, dp=2, tp=4, devices=cpu8)
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    sharded = encode_frames(params, cfg, jnp.asarray(frames), mesh=mesh)
    single = sam_lib.encode_image(params, cfg, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=2e-4, rtol=1e-3)


def test_decode_prompt_batch(small_sam):
    cfg, params = small_sam
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.standard_normal((1, 4, 4, 256)).astype(np.float32))
    N = 5
    coords = jnp.asarray(rng.uniform(0, 64, (N, 2, 2)).astype(np.float32))
    labels = jnp.tile(jnp.asarray([[1.0, -1.0]], jnp.float32), (N, 1))
    masks, iou = decode_prompt_batch(params, cfg, emb, coords, labels,
                                     multimask=False)
    assert masks.shape == (N, 1, 16, 16)
    assert iou.shape == (N, 1)
    # Each prompt must match its individual decode.
    m0, i0 = sam_lib.decode_masks(params, cfg, emb, coords[2:3], labels[2:3],
                                  multimask=False)
    np.testing.assert_allclose(np.asarray(masks[2]), np.asarray(m0[0]),
                               atol=1e-4)


def test_train_step_sharded(cpu8, small_sam):
    from dlimgedit_tpu.train.step import (
        TrainConfig,
        init_train_state,
        make_train_step,
        place_train_state,
    )

    cfg, params = small_sam
    mesh = make_mesh(8, devices=cpu8)
    opt_state = init_train_state(params)
    step = make_train_step(cfg, TrainConfig(), donate=False)
    rng = np.random.default_rng(3)
    B, L = 8, cfg.mask_input_size
    batch = {
        "images": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "point_coords": rng.uniform(0, 64, (B, 2, 2)).astype(np.float32),
        "point_labels": np.tile(np.array([[1.0, -1.0]], np.float32), (B, 1)),
        "masks": (rng.random((B, L, L)) > 0.5).astype(np.float32),
    }
    with mesh:
        p, o, batch_d = place_train_state(params, opt_state, batch, mesh)
        p2, o2, loss, aux = step(p, o, batch_d)
    assert np.isfinite(float(loss))
    # Params actually changed (pick one that certainly receives gradient;
    # hypernet MLPs of never-selected tokens legitimately have zero grads).
    before = np.asarray(params["encoder"]["patch_embed"]["conv1"]["w"])
    after = np.asarray(p2["encoder"]["patch_embed"]["conv1"]["w"])
    assert not np.allclose(before, after)
    # Loss decreases over a few steps on a fixed batch.
    with mesh:
        losses = [float(loss)]
        for _ in range(3):
            p2, o2, l, _ = step(p2, o2, batch_d)
            losses.append(float(l))
    assert losses[-1] < losses[0]


def test_segment_frames_dp_matches_single_device(cpu8):
    """BiRefNet batched over a dp mesh == per-frame single-device output."""
    import os

    from dlimgedit_tpu.models import birefnet
    from dlimgedit_tpu.models.swin import SwinConfig
    from dlimgedit_tpu.parallel.batch import segment_frames

    assert os.environ.get("DLIMG_BIREFNET_TEST_SLIM") == "1"
    slim = birefnet.BiRefNetConfig(
        img_size=64,
        swin_cfg=SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                            num_heads=(1, 2, 4, 8), window=4))
    params = birefnet.init_birefnet(jax.random.PRNGKey(0), slim)
    mesh = make_mesh(8, dp=8, devices=jax.devices("cpu")[:8])
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.standard_normal((8, 64, 64, 3))
                         .astype(np.float32))
    sharded = segment_frames(params, slim, frames, mesh=mesh)
    single = birefnet.birefnet_apply(params, frames[:1], slim)
    assert sharded.shape == (8, 64, 64, 1)
    np.testing.assert_allclose(np.asarray(sharded[0]), np.asarray(single[0]),
                               atol=3e-4, rtol=1e-3)
