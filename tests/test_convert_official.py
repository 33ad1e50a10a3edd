"""Converter mechanics test: build a synthetic official-format state dict
whose shapes mirror the real MobileSAM checkpoint, convert it, and verify
the resulting pytree is structurally identical to init_sam's output (same
paths, same shapes) — so a real mobile_sam.pt will drop in unchanged."""

import numpy as np
import pytest

import jax

from dlimgedit_tpu.convert.mobile_sam import convert_checkpoint
from dlimgedit_tpu.models import sam as sam_lib
from dlimgedit_tpu.models.tinyvit import TinyViTConfig, attention_bias_idxs
from dlimgedit_tpu.utils.pytree_io import flatten_tree


def synth_mobile_sam_state_dict(rng) -> dict:
    """Synthesize mobile_sam.pt-shaped arrays (original torch layouts)."""
    sd = {}

    def conv_bn(prefix, cin, cout, ks, groups=1):
        sd[f"{prefix}.c.weight"] = rng.standard_normal(
            (cout, cin // groups, ks, ks)).astype(np.float32)
        for k, v in [("weight", np.ones(cout)), ("bias", np.zeros(cout)),
                     ("running_mean", rng.standard_normal(cout) * 0.1),
                     ("running_var", np.abs(rng.standard_normal(cout)) + 0.5)]:
            sd[f"{prefix}.bn.{k}"] = np.asarray(v, np.float32)

    def lin(prefix, cin, cout, bias=True):
        sd[f"{prefix}.weight"] = rng.standard_normal((cout, cin)).astype(
            np.float32)
        if bias:
            sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def ln(prefix, dim):
        sd[f"{prefix}.weight"] = np.ones(dim, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(dim, np.float32)

    cfg = TinyViTConfig()
    ed = cfg.embed_dims
    e = "image_encoder."
    conv_bn(f"{e}patch_embed.seq.0", 3, ed[0] // 2, 3)
    conv_bn(f"{e}patch_embed.seq.2", ed[0] // 2, ed[0], 3)
    for i in range(4):
        for j in range(cfg.depths[i]):
            b = f"{e}layers.{i}.blocks.{j}"
            if i == 0:
                h = int(ed[0] * cfg.mbconv_expand_ratio)
                conv_bn(f"{b}.conv1", ed[0], h, 1)
                conv_bn(f"{b}.conv2", h, h, 3, groups=h)
                conv_bn(f"{b}.conv3", h, ed[0], 1)
            else:
                dim, nh, ws = ed[i], cfg.num_heads[i], cfg.window_sizes[i]
                ln(f"{b}.attn.norm", dim)
                lin(f"{b}.attn.qkv", dim, 3 * dim)
                lin(f"{b}.attn.proj", dim, dim)
                _, n_off = attention_bias_idxs(ws)
                sd[f"{b}.attn.attention_biases"] = rng.standard_normal(
                    (nh, n_off)).astype(np.float32)
                conv_bn(f"{b}.local_conv", dim, dim, cfg.local_conv_size,
                        groups=dim)
                ln(f"{b}.mlp.norm", dim)
                lin(f"{b}.mlp.fc1", dim, 4 * dim)
                lin(f"{b}.mlp.fc2", 4 * dim, dim)
        if i < 3:
            d = f"{e}layers.{i}.downsample"
            conv_bn(f"{d}.conv1", ed[i], ed[i + 1], 1)
            conv_bn(f"{d}.conv2", ed[i + 1], ed[i + 1], 3, groups=ed[i + 1])
            conv_bn(f"{d}.conv3", ed[i + 1], ed[i + 1], 1)
    sd[f"{e}neck.0.weight"] = rng.standard_normal(
        (256, ed[3], 1, 1)).astype(np.float32)
    ln(f"{e}neck.1", 256)
    sd[f"{e}neck.2.weight"] = rng.standard_normal(
        (256, 256, 3, 3)).astype(np.float32)
    ln(f"{e}neck.3", 256)

    # prompt encoder
    p = "prompt_encoder."
    sd[f"{p}pe_layer.positional_encoding_gaussian_matrix"] = \
        rng.standard_normal((2, 128)).astype(np.float32)
    for i in range(4):
        sd[f"{p}point_embeddings.{i}.weight"] = rng.standard_normal(
            (1, 256)).astype(np.float32)
    sd[f"{p}not_a_point_embed.weight"] = rng.standard_normal(
        (1, 256)).astype(np.float32)
    sd[f"{p}no_mask_embed.weight"] = rng.standard_normal(
        (1, 256)).astype(np.float32)
    for name, cin, cout, ks in [("0", 1, 4, 2), ("3", 4, 16, 2),
                                ("6", 16, 256, 1)]:
        sd[f"{p}mask_downscaling.{name}.weight"] = rng.standard_normal(
            (cout, cin, ks, ks)).astype(np.float32)
        sd[f"{p}mask_downscaling.{name}.bias"] = rng.standard_normal(
            cout).astype(np.float32)
    ln(f"{p}mask_downscaling.1", 4)
    ln(f"{p}mask_downscaling.4", 16)

    # mask decoder
    m = "mask_decoder."
    for i in range(2):
        b = f"{m}transformer.layers.{i}"
        for a, dim in [("self_attn", 256), ("cross_attn_token_to_image", 128),
                       ("cross_attn_image_to_token", 128)]:
            lin(f"{b}.{a}.q_proj", 256, dim)
            lin(f"{b}.{a}.k_proj", 256, dim)
            lin(f"{b}.{a}.v_proj", 256, dim)
            lin(f"{b}.{a}.out_proj", dim, 256)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            ln(f"{b}.{n}", 256)
        lin(f"{b}.mlp.lin1", 256, 2048)
        lin(f"{b}.mlp.lin2", 2048, 256)
    for a in ("q_proj", "k_proj", "v_proj"):
        lin(f"{m}transformer.final_attn_token_to_image.{a}", 256, 128)
    lin(f"{m}transformer.final_attn_token_to_image.out_proj", 128, 256)
    ln(f"{m}transformer.norm_final_attn", 256)
    sd[f"{m}iou_token.weight"] = rng.standard_normal((1, 256)).astype(np.float32)
    sd[f"{m}mask_tokens.weight"] = rng.standard_normal((4, 256)).astype(np.float32)
    sd[f"{m}output_upscaling.0.weight"] = rng.standard_normal(
        (256, 64, 2, 2)).astype(np.float32)
    sd[f"{m}output_upscaling.0.bias"] = rng.standard_normal(64).astype(np.float32)
    ln(f"{m}output_upscaling.1", 64)
    sd[f"{m}output_upscaling.3.weight"] = rng.standard_normal(
        (64, 32, 2, 2)).astype(np.float32)
    sd[f"{m}output_upscaling.3.bias"] = rng.standard_normal(32).astype(np.float32)
    for i in range(4):
        h = f"{m}output_hypernetworks_mlps.{i}"
        lin(f"{h}.layers.0", 256, 256)
        lin(f"{h}.layers.1", 256, 256)
        lin(f"{h}.layers.2", 256, 32)
    lin(f"{m}iou_prediction_head.layers.0", 256, 256)
    lin(f"{m}iou_prediction_head.layers.1", 256, 256)
    lin(f"{m}iou_prediction_head.layers.2", 256, 4)
    return sd


def test_official_conversion_structure_matches_init():
    rng = np.random.default_rng(0)
    sd = synth_mobile_sam_state_dict(rng)
    converted = convert_checkpoint(sd, "mobile_sam")

    cfg = sam_lib.make_config("mobile_sam", image_size=1024)
    reference = sam_lib.init_sam(jax.random.PRNGKey(0), cfg)

    flat_c = flatten_tree(converted)
    flat_r = flatten_tree(jax.tree_util.tree_map(np.asarray, reference))
    assert set(flat_c.keys()) == set(flat_r.keys()), (
        sorted(set(flat_r) - set(flat_c))[:5],
        sorted(set(flat_c) - set(flat_r))[:5])
    for k in flat_r:
        assert flat_c[k].shape == flat_r[k].shape, (
            k, flat_c[k].shape, flat_r[k].shape)


def test_bn_folding_math():
    """Folded Conv2d_BN == conv then eval-mode BatchNorm."""
    from dlimgedit_tpu.convert.mobile_sam import _conv_bn
    import jax.numpy as jnp
    from dlimgedit_tpu.models.common import conv_bn

    rng = np.random.default_rng(1)
    sd = {
        "m.c.weight": rng.standard_normal((4, 3, 3, 3)).astype(np.float32),
        "m.bn.weight": rng.standard_normal(4).astype(np.float32),
        "m.bn.bias": rng.standard_normal(4).astype(np.float32),
        "m.bn.running_mean": rng.standard_normal(4).astype(np.float32),
        "m.bn.running_var": np.abs(rng.standard_normal(4)).astype(np.float32)
        + 0.5,
    }
    p = _conv_bn(sd, "m")
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    y = np.asarray(conv_bn(p, jnp.asarray(x), padding=1))

    # Reference: conv (via jax, same layout) then BN formula.
    from dlimgedit_tpu.models.common import conv2d

    raw = np.asarray(conv2d(jnp.asarray(x),
                            jnp.asarray(sd["m.c.weight"].transpose(2, 3, 1, 0)),
                            padding=1))
    bn = ((raw - sd["m.bn.running_mean"])
          / np.sqrt(sd["m.bn.running_var"] + 1e-5)
          * sd["m.bn.weight"] + sd["m.bn.bias"])
    np.testing.assert_allclose(y, bn, atol=1e-4)


def test_swin_backbone_conversion_structure():
    """Synthetic torch-Swin state dict converts to a tree structurally equal
    to init_swin's output (so real BiRefNet backbones drop in)."""
    from dlimgedit_tpu.convert.birefnet import convert_swin_backbone
    from dlimgedit_tpu.models.swin import SwinConfig, init_swin

    cfg = SwinConfig()  # swin_v1_tiny
    rng = np.random.default_rng(0)
    sd = {}

    def lin(prefix, cin, cout):
        sd[f"{prefix}.weight"] = rng.standard_normal(
            (cout, cin)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def ln(prefix, dim):
        sd[f"{prefix}.weight"] = np.ones(dim, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(dim, np.float32)

    sd["bb.patch_embed.proj.weight"] = rng.standard_normal(
        (cfg.embed_dim, 3, 4, 4)).astype(np.float32)
    sd["bb.patch_embed.proj.bias"] = rng.standard_normal(
        cfg.embed_dim).astype(np.float32)
    ln("bb.patch_embed.norm", cfg.embed_dim)
    for i in range(4):
        dim = cfg.stage_dim(i)
        for j in range(cfg.depths[i]):
            b = f"bb.layers.{i}.blocks.{j}"
            ln(f"{b}.norm1", dim)
            lin(f"{b}.attn.qkv", dim, 3 * dim)
            lin(f"{b}.attn.proj", dim, dim)
            sd[f"{b}.attn.relative_position_bias_table"] = \
                rng.standard_normal(((2 * cfg.window - 1) ** 2,
                                     cfg.num_heads[i])).astype(np.float32)
            ln(f"{b}.norm2", dim)
            lin(f"{b}.mlp.fc1", dim, 4 * dim)
            lin(f"{b}.mlp.fc2", 4 * dim, dim)
        if i < 3:
            d = f"bb.layers.{i}.downsample"
            ln(f"{d}.norm", 4 * dim)
            sd[f"{d}.reduction.weight"] = rng.standard_normal(
                (2 * dim, 4 * dim)).astype(np.float32)

    converted = convert_swin_backbone(sd)
    reference = init_swin(jax.random.PRNGKey(0), cfg)
    flat_c = flatten_tree(converted)
    flat_r = flatten_tree(jax.tree_util.tree_map(np.asarray, reference))
    assert set(flat_c.keys()) == set(flat_r.keys()), (
        sorted(set(flat_r) - set(flat_c))[:5],
        sorted(set(flat_c) - set(flat_r))[:5])
    for k in flat_r:
        assert flat_c[k].shape == flat_r[k].shape, (
            k, flat_c[k].shape, flat_r[k].shape)
