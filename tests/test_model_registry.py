"""Model-registry breadth: every SAM variant config builds and (small) runs;
backend errors; environment dtype policy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.models.common import param_count


@pytest.mark.parametrize("variant,depth", [("vit_b", 12), ("vit_l", 24),
                                           ("vit_h", 32)])
def test_vit_variant_configs(variant, depth):
    cfg = sam_lib.make_config(variant, image_size=64)
    assert cfg.encoder_vit.depth == depth
    assert cfg.embedding_size == 4
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    assert len(params["encoder"]["blocks"]) == depth


def test_vit_l_small_forward():
    cfg = sam_lib.make_config("vit_l", image_size=32)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 32, 32, 3))
    emb = sam_lib.encode_image(params, cfg, x)
    assert emb.shape == (1, 2, 2, 256)


def test_unknown_variant_raises():
    with pytest.raises(ValueError):
        sam_lib.make_config("vit_z")


def test_mobile_sam_param_count():
    # MobileSAM is ~10M params total (TinyViT-5M encoder + SAM decoder).
    cfg = sam_lib.make_config("mobile_sam", image_size=1024)
    params = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)
    n = param_count(params)
    assert 9e6 < n < 12e6, n


def test_accelerator_backend_unavailable_raises():
    from dlimgedit_tpu import Backend, Environment, Options
    from dlimgedit_tpu.errors import DlimgError
    import dlimgedit_tpu.runtime.environment as re_mod

    if re_mod.is_supported(Backend.gpu):
        pytest.skip("accelerator present")
    with pytest.raises(DlimgError):
        Environment(Options(backend=Backend.gpu, allow_random_weights=True))


def test_compute_dtype_policy():
    """Encoder weights follow compute dtype; decoder stays f32."""
    from dlimgedit_tpu import Backend, Environment, Options

    env = Environment(Options(backend=Backend.cpu, allow_random_weights=True,
                              compute_dtype="bfloat16", sam_image_size=64))
    bundle = env.sam_model("mobile_sam")
    enc_leaf = bundle.params["encoder"]["patch_embed"]["conv1"]["w"]
    dec_leaf = bundle.params["decoder"]["iou_token"]
    assert enc_leaf.dtype == jnp.bfloat16
    assert dec_leaf.dtype == jnp.float32
