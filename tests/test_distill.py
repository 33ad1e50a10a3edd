"""Encoder distillation (train/distill.py): the MobileSAM-style recipe that
produces the reference's own encoder artifact — teacher embeddings, student
MSE step, decoder graft, and the dp-sharded step.

Compile discipline: ONE jitted distill step (module fixture) shared by the
single-device and sharded tests; everything else runs eager."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.train.distill import (
    DistillConfig,
    distill_loss,
    graft_student,
    init_distill_state,
    make_distill_step,
    place_distill_state,
    teacher_embeddings,
)

B, S = 2, 64  # grid 4 for both encoders at image 64


@pytest.fixture(scope="module")
def setup():
    teacher_cfg = sam_lib.make_config("vit_b", image_size=S)
    student_cfg = sam_lib.make_config("mobile_sam", image_size=S)
    teacher = sam_lib.init_sam(jax.random.PRNGKey(0), teacher_cfg)
    student = sam_lib.init_sam(jax.random.PRNGKey(1), student_cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    emb = teacher_embeddings(teacher, teacher_cfg, images)
    batch = {"images": images, "teacher_emb": emb}
    return teacher_cfg, student_cfg, teacher, student, batch


@pytest.fixture(scope="module")
def stepped(setup):
    """One compiled step, driven 3 steps from the initial student."""
    _, student_cfg, _, student, batch = setup
    tcfg = DistillConfig(learning_rate=1e-3)
    step = make_distill_step(student_cfg, tcfg, donate=False)
    enc = student["encoder"]
    opt = init_distill_state(enc, tcfg)
    losses = []
    for _ in range(3):
        enc, opt, loss, aux = step(enc, opt, batch)
        losses.append(float(loss))
    return tcfg, step, enc, losses, aux


def test_teacher_embeddings_shape_and_dtype(setup):
    teacher_cfg, _, _, _, batch = setup
    emb = batch["teacher_emb"]
    g = teacher_cfg.prompt.image_embedding_size
    assert emb.shape == (B, g, g, 256)
    assert emb.dtype == jnp.float32


def test_distill_loss_decreases(stepped):
    _, _, _, losses, aux = stepped
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert set(aux) == {"mse"}


def test_step_trains_only_the_encoder(setup, stepped):
    """The step operates on the encoder subtree alone — the teacher's
    decoder cannot drift during distillation (MobileSAM's decoupling) —
    and every encoder leaf structure is preserved while values move."""
    _, _, _, student, _ = setup
    _, _, enc, _, _ = stepped
    assert (jax.tree_util.tree_structure(enc)
            == jax.tree_util.tree_structure(student["encoder"]))
    before = np.asarray(jax.tree_util.tree_leaves(student["encoder"])[0])
    after = np.asarray(jax.tree_util.tree_leaves(enc)[0])
    assert before.shape == after.shape
    assert not np.allclose(before, after)


def test_graft_student_serves(setup, stepped):
    """graft_student assembles a full servable SAM tree: student encoder +
    teacher prompt-encoder/decoder; decode_masks runs on it unchanged."""
    teacher_cfg, student_cfg, teacher, _, batch = setup
    _, _, enc, _, _ = stepped
    grafted = graft_student(enc, teacher)
    assert set(grafted) == {"encoder", "prompt_encoder", "decoder"}
    emb = sam_lib.encode_image(grafted, student_cfg, batch["images"][:1])
    points = jnp.asarray([[[32.0, 32.0], [0.0, 0.0]]], jnp.float32)
    labels = jnp.asarray([[1.0, -1.0]], jnp.float32)
    masks, iou = sam_lib.decode_masks(grafted, student_cfg,
                                      emb.astype(jnp.float32), points, labels,
                                      multimask=False)
    L = student_cfg.mask_input_size
    assert masks.shape == (1, 1, L, L)
    assert np.all(np.isfinite(np.asarray(iou)))


def test_remat_identical_loss(setup):
    _, student_cfg, _, student, batch = setup
    l0, _ = distill_loss(student, student_cfg, batch, DistillConfig())
    l1, _ = distill_loss(student, student_cfg, batch,
                         DistillConfig(remat=True))
    assert float(l0) == float(l1)


def test_bf16_policy_returns_f32_grads(setup):
    _, student_cfg, _, student, batch = setup
    tcfg = DistillConfig(compute_dtype="bfloat16")

    def loss_enc(enc):
        return distill_loss({"encoder": enc}, student_cfg, batch, tcfg)[0]

    grads = jax.grad(loss_enc)(student["encoder"])
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(g)))


def test_sharded_step_matches_single_device(setup, stepped):
    """dp=2 over 2 virtual CPUs: identical loss and (to psum reassociation)
    identical GRADIENTS. Parity is asserted on gradients, not post-adamw
    params: ~1.6% of the encoder's grad elements at init are below 1e-7
    (measured — unused rel-pos offsets etc.), where adam's g/(|g|+eps)
    normalisation amplifies the f32 collective reassociation into O(lr)
    param differences that say nothing about the sharding's correctness."""
    from jax.sharding import Mesh

    _, student_cfg, _, student, batch = setup
    tcfg, step, _, losses, _ = stepped
    enc = student["encoder"]
    opt = init_distill_state(enc, tcfg)
    mesh = Mesh(np.asarray(jax.devices("cpu")[:2]).reshape(2, 1),
                ("dp", "tp"))

    grad_fn = jax.jit(jax.grad(
        lambda e, b: distill_loss({"encoder": e}, student_cfg, b, tcfg)[0]))
    g1 = grad_fn(enc, batch)
    with mesh:
        enc_d, opt_d, batch_d = place_distill_state(enc, opt, batch, mesh)
        g2 = grad_fn(enc_d, batch_d)
        _, _, loss2, _ = step(enc_d, opt_d, batch_d)
    assert abs(losses[0] - float(loss2)) < 1e-6 * max(1.0, abs(losses[0]))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)


def test_teacher_embeddings_sharded_matches(setup):
    """teacher_embeddings over a (dp, tp) mesh == single-device (the frozen
    teacher path is parallel/batch.encode_frames)."""
    from dlimgedit_tpu.parallel.mesh import make_mesh

    teacher_cfg, _, teacher, _, batch = setup
    mesh = make_mesh(2, dp=2, devices=jax.devices("cpu")[:2])
    sharded = teacher_embeddings(teacher, teacher_cfg, batch["images"],
                                 mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded),
                               np.asarray(batch["teacher_emb"]),
                               atol=2e-5, rtol=1e-4)
