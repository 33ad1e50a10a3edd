"""Sequence-parallel encoder (parallel/sp.py) parity vs the single-device
path — window-sharded residual stream, collectives only at global blocks.

Geometry cases cover the three layout regimes:
  * window grid divides evenly AND window count divides sp (no padding);
  * grid padding (G % ws != 0) — pad-token masking must match the
    single-chip pad-after-LayerNorm semantics;
  * window count NOT divisible by sp — dummy-window padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.models.vit_sam import SamViTConfig, init_sam_vit, sam_vit_apply
from dlimgedit_tpu.parallel.sp import (
    encode_image_sp,
    make_sp_mesh,
    sam_vit_apply_sp,
)


def _tiny_cfg(img_size: int, window: int = 4) -> SamViTConfig:
    return SamViTConfig(img_size=img_size, patch_size=16, embed_dim=64,
                        depth=4, num_heads=2, window_size=window,
                        global_attn_indexes=(1, 3))


@pytest.mark.parametrize("img_size,window,sp,B", [
    (128, 4, 4, 1),   # grid 8 = 2x2 windows of 4 -> 4 windows, even split
    (144, 4, 4, 1),   # grid 9 -> padded 12 -> 9 windows, pad + dummy windows
    (128, 4, 8, 2),   # 8 windows over sp=8, batch > 1
])
def test_sp_parity(img_size, window, sp, B):
    cfg = _tiny_cfg(img_size, window)
    params = init_sam_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, img_size, img_size, 3)),
                    jnp.float32)

    ref = sam_vit_apply(params, x, cfg)
    mesh = make_sp_mesh(sp, devices=jax.devices("cpu"))
    got = jax.jit(lambda p, im: sam_vit_apply_sp(p, im, cfg, mesh))(params, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_sp_parity_flash_interpret():
    """Flash mode routes global blocks through the replicated fallback
    (the Pallas kernel covers the full grid); parity must still hold."""
    cfg = _tiny_cfg(128, 4)
    cfg = SamViTConfig(**{**cfg.__dict__, "use_flash_attention": True,
                          "flash_interpret": True})
    params = init_sam_vit(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
    ref = sam_vit_apply(params, x, cfg)
    mesh = make_sp_mesh(4, devices=jax.devices("cpu"))
    got = jax.jit(lambda p, im: sam_vit_apply_sp(p, im, cfg, mesh))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_encode_image_sp_matches_encode_image():
    cfg = sam_lib.make_config("vit_b", image_size=128)
    # Shrink to test scale: the preset's depth/width at 8 CPU devices is
    # compile-heavy; geometry (window 14 > grid 8 -> single padded window)
    # still exercises the pad path end to end.
    params = sam_lib.init_sam(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)

    ref = sam_lib.encode_image(params, cfg, x)
    got = encode_image_sp(params, cfg, x,
                          mesh=make_sp_mesh(2, devices=jax.devices("cpu")))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_sp_parity_window_size_zero():
    """window_size=0 (every block global in the dense path) must degrade
    to one grid-sized window — not a ZeroDivisionError at trace time."""
    cfg = SamViTConfig(img_size=128, patch_size=16, embed_dim=64, depth=2,
                       num_heads=2, window_size=0, global_attn_indexes=(1,))
    params = init_sam_vit(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
    ref = sam_vit_apply(params, x, cfg)
    mesh = make_sp_mesh(2, devices=jax.devices("cpu"))
    got = jax.jit(lambda p, im: sam_vit_apply_sp(p, im, cfg, mesh))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_make_sp_mesh_rejects_too_few_devices():
    """A smaller-than-requested mesh must fail loudly (a silent truncation
    would let parity gates pass while exercising no parallelism)."""
    with pytest.raises(ValueError, match="devices visible"):
        make_sp_mesh(1024, devices=jax.devices("cpu"))


def test_encode_image_sp_rejects_tinyvit():
    cfg = sam_lib.make_config("mobile_sam", image_size=64)
    params = {"encoder": {}}
    with pytest.raises(ValueError, match="ViT encoder"):
        encode_image_sp(params, cfg, jnp.zeros((1, 64, 64, 3)),
                        mesh=make_sp_mesh(2, devices=jax.devices("cpu")))
