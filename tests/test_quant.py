"""Weight-only int8 quantisation tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlimgedit_tpu.models.common import linear
from dlimgedit_tpu.ops.quant import (
    dequantize_weight,
    quantize_encoder,
    quantize_weight,
    quantized_bytes,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    back = dequantize_weight(w_q, scale, jnp.float32)
    # Per-channel error bounded by half a quantisation step.
    step = np.asarray(scale)
    err = np.abs(np.asarray(back) - np.asarray(w))
    assert (err <= step[None, :] * 0.5 + 1e-6).all()


def test_linear_quantized_close_to_full():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((32, 48)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    full = linear({"w": w, "b": b}, x)
    w_q, scale = quantize_weight(w)
    quant = linear({"w_q": w_q, "w_scale": scale, "b": b}, x)
    # int8 weight noise: relative output error well under 1%.
    denom = np.abs(np.asarray(full)).mean()
    assert np.abs(np.asarray(quant - full)).mean() / denom < 0.01


def test_quantize_encoder_tree_and_memory():
    from dlimgedit_tpu.models import sam as sam_lib

    cfg = sam_lib.make_config("mobile_sam", image_size=64)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    enc = params["encoder"]
    q = quantize_encoder(enc)
    # qkv weights replaced; convs/norms untouched.
    blk = q["stages"][1]["blocks"][0]
    assert "w_q" in blk["attn"]["qkv"] and "w" not in blk["attn"]["qkv"]
    assert blk["attn"]["qkv"]["w_q"].dtype == jnp.int8
    assert "w" in q["patch_embed"]["conv1"]  # conv untouched
    assert quantized_bytes(q) < quantized_bytes(enc)

    # Forward still runs and correlates with the full-precision encoder.
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    full = sam_lib.encode_image(params, cfg, x)
    qp = dict(params)
    qp["encoder"] = q
    quant = sam_lib.encode_image(qp, cfg, x)
    a = np.asarray(full).ravel()
    b = np.asarray(quant).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr


def test_quantize_path_matching_is_exact():
    # Exact last-segment matching: "proj" is eligible, a module whose name
    # merely CONTAINS "proj" is not.
    w = jnp.ones((8, 8), jnp.float32)
    tree = {"proj": {"w": w}, "reproj": {"w": w}, "proj_out": {"w": w}}
    q = quantize_encoder(tree)
    assert "w_q" in q["proj"] and "w" not in q["proj"]
    assert "w" in q["reproj"] and "w_q" not in q["reproj"]
    assert "w" in q["proj_out"]


def test_int8_activation_linear_close_to_full():
    from dlimgedit_tpu.ops.quant import int8_linear

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal(96).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((4, 32, 64)).astype(np.float32))
    full = linear({"w": w, "b": b}, x)
    w_q, scale = quantize_weight(w)
    quant = int8_linear({"w_q8": w_q, "w_scale": scale, "b": b}, x)
    assert quant.shape == full.shape
    denom = np.abs(np.asarray(full)).mean()
    # int8 weight AND activation noise: still ~1%-class relative error.
    assert np.abs(np.asarray(quant - full)).mean() / denom < 0.02
    # int32 accumulation path actually taken (dtype check on dispatch).
    via_linear = linear({"w_q8": w_q, "w_scale": scale, "b": b}, x)
    np.testing.assert_array_equal(np.asarray(quant), np.asarray(via_linear))


def test_quantize_encoder_act_int8_forward():
    from dlimgedit_tpu.models import sam as sam_lib

    cfg = sam_lib.make_config("mobile_sam", image_size=64)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    q = quantize_encoder(params["encoder"], act_int8=True)
    blk = q["stages"][1]["blocks"][0]
    assert "w_q8" in blk["attn"]["qkv"]
    full = sam_lib.encode_image(params, cfg, jax.random.normal(
        jax.random.PRNGKey(1), (1, 64, 64, 3)))
    qp = dict(params)
    qp["encoder"] = q
    quant = sam_lib.encode_image(qp, cfg, jax.random.normal(
        jax.random.PRNGKey(1), (1, 64, 64, 3)))
    a, b = np.asarray(full).ravel(), np.asarray(quant).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr


def test_environment_quantize_activations_option():
    from dlimgedit_tpu import Backend, Environment, Options

    env = Environment(Options(backend=Backend.cpu, allow_random_weights=True,
                              compute_dtype="float32", sam_image_size=64,
                              quantize_encoder=True,
                              quantize_activations=True))
    bundle = env.sam_model("mobile_sam")
    blk = bundle.params["encoder"]["stages"][1]["blocks"][0]
    assert "w_q8" in blk["attn"]["qkv"]
    # Scales stay f32 (computed from f32 weights, never bf16-rounded).
    assert blk["attn"]["qkv"]["w_scale"].dtype == jnp.float32


def test_environment_quantize_option():
    from dlimgedit_tpu import Backend, Environment, Options

    env = Environment(Options(backend=Backend.cpu, allow_random_weights=True,
                              compute_dtype="float32", sam_image_size=64,
                              quantize_encoder=True))
    bundle = env.sam_model("mobile_sam")
    blk = bundle.params["encoder"]["stages"][1]["blocks"][0]
    assert "w_q" in blk["attn"]["qkv"]
