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


def test_tinyvit_fused_norm_matches_stock():
    """TinyViT with use_fused_norm (the TPU config) == the stock LN path."""
    import dataclasses

    import jax

    from dlimgedit_tpu.models import tinyvit

    cfg = tinyvit.TinyViTConfig(img_size=64)
    params = tinyvit.init_tiny_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    stock = tinyvit.tiny_vit_apply(params, x, cfg)
    fused_cfg = dataclasses.replace(cfg, use_fused_norm=True,
                                    fused_interpret=True)
    fused = tinyvit.tiny_vit_apply(params, x, fused_cfg)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(stock),
                               atol=2e-5, rtol=1e-4)


def test_fused_add_layer_norm_matches_unfused():
    """(x+d, LN(x+d)) from the fused kernel == the separate add -> LN
    chain, including the non-divisible-row padding path."""
    import jax

    from dlimgedit_tpu.ops.fused_norm import (fused_add_layer_norm,
                                              fused_layer_norm)

    rng = np.random.default_rng(0)
    for shape in ((4, 7, 33), (1, 12, 12, 64)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        d = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(shape[-1]).astype(np.float32))
        s, y = jax.jit(lambda a, b: fused_add_layer_norm(
            a, b, scale, bias, interpret=True))(x, d)
        np.testing.assert_allclose(np.asarray(s), np.asarray(x + d),
                                   atol=1e-6)
        want = fused_layer_norm(x + d, scale, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_vit_carry_chain_matches_blockwise():
    """sam_vit_apply's residual-carry chain (fused add+LN) == the
    per-block form with plain adds, on the flash/interpret config."""
    import dataclasses

    import jax

    from dlimgedit_tpu.models.vit_sam import (SamViTConfig, init_sam_vit,
                                              sam_vit_apply)

    cfg = SamViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=3,
                       num_heads=4, window_size=2, global_attn_indexes=(1,),
                       use_flash_attention=True, flash_interpret=True)
    params = init_sam_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    fused = sam_vit_apply(params, x, cfg)
    plain = sam_vit_apply(params, x,
                          dataclasses.replace(cfg, use_flash_attention=False,
                                              fused_layer_norm=False))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=5e-5, rtol=1e-4)
