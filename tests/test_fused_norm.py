import numpy as np
import jax
import jax.numpy as jnp

from dlimgedit_tpu.models.common import layer_norm
from dlimgedit_tpu.ops.fused_norm import fused_layer_norm


def test_fused_layer_norm_matches_reference():
    rng = np.random.default_rng(0)
    for shape in [(1, 8, 8, 96), (2, 3, 128), (16, 256)]:
        C = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        ref = layer_norm({"scale": scale, "bias": bias}, x, eps=1e-6)
        out = fused_layer_norm(x, scale, bias, eps=1e-6, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_fused_layer_norm_bf16_dtype_preserved():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 4, 64)), jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    out = fused_layer_norm(x, scale, bias, interpret=True)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (4, 4, 64)
