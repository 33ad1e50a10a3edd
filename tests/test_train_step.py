"""Trainer-depth tests: gradient accumulation and LR schedules
(train/step.py)."""

import numpy as np

import jax

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.train.step import (
    TrainConfig,
    init_train_state,
    learning_rate_schedule,
    make_train_step,
)


def _setup(B=8, seed=0):
    cfg = sam_lib.make_config("mobile_sam", image_size=64)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(seed)
    L = cfg.mask_input_size
    batch = {
        "images": rng.standard_normal((B, 64, 64, 3)).astype(np.float32),
        "point_coords": rng.uniform(0, 64, (B, 2, 2)).astype(np.float32),
        "point_labels": np.tile(np.array([[1.0, -1.0]], np.float32), (B, 1)),
        "masks": (rng.random((B, L, L)) > 0.5).astype(np.float32),
    }
    return cfg, params, batch


def test_grad_accumulation_matches_full_batch():
    """accum_steps=4 over B=8 must produce the SAME update as the full-batch
    step: every loss term is a mean over equal-sized microbatches, so the
    accumulated mean gradient is the full-batch gradient exactly (up to fp
    reassociation)."""
    cfg, params, batch = _setup(B=8)
    tcfg = TrainConfig()
    opt_state = init_train_state(params, tcfg)

    full = make_train_step(cfg, tcfg, donate=False)
    acc = make_train_step(cfg, tcfg, donate=False, accum_steps=4)

    p_full, _, loss_full, aux_full = full(params, opt_state, batch)
    p_acc, _, loss_acc, aux_acc = acc(params, opt_state, batch)

    assert abs(float(loss_full) - float(loss_acc)) < 1e-4
    for k in aux_full:
        assert abs(float(aux_full[k]) - float(aux_acc[k])) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_remat_encoder_identical_numerics():
    """jax.checkpoint over the encoder recomputes activations in the
    backward pass. The forward loss is bit-identical; gradients agree to
    rounding (XLA fuses the recomputation differently, so bit-exactness
    across the two program structures is not guaranteed — observed drift
    is ~1e-11 on 1e-4-scale adam updates)."""
    cfg, params, batch = _setup(B=2, seed=3)
    opt_state = init_train_state(params)
    plain = make_train_step(cfg, TrainConfig(), donate=False)
    remat = make_train_step(cfg, TrainConfig(remat_encoder=True),
                            donate=False)
    p0, _, l0, _ = plain(params, opt_state, batch)
    p1, _, l1, _ = remat(params, opt_state, batch)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-5)


def test_mixed_precision_encoder_training():
    """encoder_dtype=bfloat16 runs the encoder fwd/bwd on bf16 shadows of
    the f32 masters: the step must keep all params f32 (masters), produce a
    loss close to the f32 step's, and still move the encoder weights."""
    cfg, params, batch = _setup(B=2, seed=4)
    opt_state = init_train_state(params)
    f32_step = make_train_step(cfg, TrainConfig(), donate=False)
    bf16_step = make_train_step(cfg, TrainConfig(encoder_dtype="bfloat16"),
                                donate=False)
    _, _, l32, _ = f32_step(params, opt_state, batch)
    p16, _, l16, _ = bf16_step(params, opt_state, batch)
    assert np.isfinite(float(l16))
    # bf16 forward noise moves the loss a little, not a lot.
    assert abs(float(l16) - float(l32)) / abs(float(l32)) < 0.05
    for leaf in jax.tree_util.tree_leaves(p16):
        assert leaf.dtype == np.float32
    before = np.asarray(params["encoder"]["patch_embed"]["conv1"]["w"])
    after = np.asarray(p16["encoder"]["patch_embed"]["conv1"]["w"])
    assert not np.allclose(before, after)


def test_lr_schedule_shape():
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=4, decay_steps=20)
    sched = learning_rate_schedule(tcfg)
    assert float(sched(0)) < 1e-4          # warmup starts near 0
    np.testing.assert_allclose(float(sched(4)), 1e-3, rtol=1e-6)  # peak
    assert float(sched(19)) < float(sched(10)) < 1e-3  # cosine decays
    # decay_steps counts AFTER warmup: warmup-only holds peak forever
    # (optax's own warmup_cosine_decay_schedule would zero the lr here).
    hold = learning_rate_schedule(TrainConfig(learning_rate=1e-3,
                                              warmup_steps=4))
    np.testing.assert_allclose(float(hold(1000)), 1e-3, rtol=1e-6)
    # And a short decay after a long warmup decays over decay_steps, not 1.
    short = learning_rate_schedule(TrainConfig(
        learning_rate=1e-3, warmup_steps=100, decay_steps=10))
    assert float(short(104)) > 1e-4  # mid-decay, nowhere near zero yet
    # Decay-only config starts the cosine AT peak (regression: a forced
    # 1-step warmup trained step 0 at lr=0).
    decay_only = learning_rate_schedule(TrainConfig(learning_rate=1e-3,
                                                    decay_steps=20))
    np.testing.assert_allclose(float(decay_only(0)), 1e-3, rtol=1e-6)
    assert float(decay_only(10)) < 1e-3
    # Constant config returns the plain scalar.
    assert learning_rate_schedule(TrainConfig()) == TrainConfig().learning_rate


def test_scheduled_step_decays_lr_in_state():
    """A scheduled optimizer carries a step counter; two steps advance it and
    training still runs end-to-end."""
    cfg, params, batch = _setup(B=2)
    tcfg = TrainConfig(warmup_steps=2, decay_steps=8)
    opt_state = init_train_state(params, tcfg)
    step = make_train_step(cfg, tcfg, donate=False)
    p, o, loss0, _ = step(params, opt_state, batch)
    p, o, loss1, _ = step(p, o, batch)
    counts = [int(x) for x in jax.tree_util.tree_leaves(o)
              if np.ndim(x) == 0 and np.issubdtype(
                  np.asarray(x).dtype, np.integer)]
    assert 2 in counts, counts
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
