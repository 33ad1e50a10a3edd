"""BiRefNet decoder numerical parity vs torch oracles.

Covers every decoder building block of models/birefnet.py against
independently-written torch implementations of the upstream modules
(BiRefNet models/modules/{decoder_blocks,aspp,deform_conv}.py semantics):

  * deform_conv2d — anchored two ways: against torch F.conv2d for the
    zero-offset/unit-modulator case (a REAL torch op as ground truth), and
    against a hand-written torch bilinear-sampling oracle for random
    offsets (torchvision isn't installed in this image).
  * BasicDecBlk (conv+BN+ReLU -> ASPPDeformable -> conv+BN) through the
    converter's BN folding.
  * align_corners=True bilinear resize vs F.interpolate.
  * decoder input-pyramid patch layout vs Decoder.get_patches_batch.
  * full-checkpoint conversion: synth torch state dict -> structurally
    identical pytree to init_birefnet.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dlimgedit_tpu.models.birefnet import (
    BiRefNetConfig,
    _apply_dec_blk,
    _get_patches,
    init_birefnet,
    resize_align_corners,
)
from dlimgedit_tpu.models.swin import SwinConfig
from dlimgedit_tpu.ops.deform import deform_conv2d


# ---------------------------------------------------------------------------
# Torch oracle for modulated deformable conv (torchvision semantics:
# offsets (dy, dx) interleaved per tap k = ky*kw + kx; bilinear sampling with
# zero outside; modulator multiplies the sampled value).
# ---------------------------------------------------------------------------

def _bilinear_t(x, py, px):
    B, C, H, W = x.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    wy = (py - y0).unsqueeze(1)
    wx = (px - x0).unsqueeze(1)

    def tap(yi, xi):
        inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)).unsqueeze(1)
        yc = yi.clamp(0, H - 1).long()
        xc = xi.clamp(0, W - 1).long()
        idx = (yc * W + xc).view(B, 1, -1).expand(B, C, -1)
        v = torch.gather(x.reshape(B, C, H * W), 2, idx).view(B, C, H, W)
        return v * inb

    return (tap(y0, x0) * (1 - wy) * (1 - wx)
            + tap(y0, x0 + 1) * (1 - wy) * wx
            + tap(y0 + 1, x0) * wy * (1 - wx)
            + tap(y0 + 1, x0 + 1) * wy * wx)


def deform_conv2d_oracle(x, offset, mask, w, bias, padding):
    B, C, H, W = x.shape
    O, _, kh, kw = w.shape
    ys = torch.arange(H, dtype=x.dtype).view(1, H, 1)
    xs = torch.arange(W, dtype=x.dtype).view(1, 1, W)
    out = torch.zeros(B, O, H, W, dtype=x.dtype)
    for ky in range(kh):
        for kx in range(kw):
            k = ky * kw + kx
            py = ys + (ky - padding) + offset[:, 2 * k]
            px = xs + (kx - padding) + offset[:, 2 * k + 1]
            val = _bilinear_t(x, py, px) * mask[:, k:k + 1]
            out += torch.einsum("bchw,oc->bohw", val, w[:, :, ky, kx])
    if bias is not None:
        out += bias.view(1, -1, 1, 1)
    return out


def _to_nhwc(t):
    return jnp.asarray(t.permute(0, 2, 3, 1).numpy())


def _to_hwio(t):
    return jnp.asarray(t.permute(2, 3, 1, 0).numpy())


@pytest.mark.parametrize("ks", [1, 3, 7])
def test_deform_conv_identity_case_vs_torch_conv2d(ks):
    """offset=0, modulator=1 => deform conv == plain conv (real-torch-op
    anchor; also the state every converted checkpoint starts from, since
    upstream zero-inits the offset convs)."""
    rng = np.random.default_rng(0)
    B, C, H, W, O = 2, 5, 9, 11, 4
    pad = ks // 2
    x = torch.from_numpy(rng.standard_normal((B, C, H, W)).astype(np.float32))
    w = torch.from_numpy(rng.standard_normal((O, C, ks, ks)).astype(np.float32))
    want = F.conv2d(x, w, None, 1, pad).numpy()

    K = ks * ks
    offset = jnp.zeros((B, H, W, 2 * K), jnp.float32)
    mask = jnp.ones((B, H, W, K), jnp.float32)
    got = deform_conv2d(_to_nhwc(x), offset, mask, _to_hwio(w), None, pad)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


@pytest.mark.parametrize("ks", [1, 3])
def test_deform_conv_random_offsets_vs_oracle(ks):
    rng = np.random.default_rng(1)
    B, C, H, W, O = 1, 4, 8, 10, 3
    pad = ks // 2
    K = ks * ks
    x = torch.from_numpy(rng.standard_normal((B, C, H, W)).astype(np.float32))
    w = torch.from_numpy(rng.standard_normal((O, C, ks, ks)).astype(np.float32))
    bias = torch.from_numpy(rng.standard_normal(O).astype(np.float32))
    # Offsets large enough to push some taps out of bounds.
    offset = torch.from_numpy(
        (rng.standard_normal((B, 2 * K, H, W)) * 2.5).astype(np.float32))
    mask = torch.from_numpy(
        rng.uniform(0, 2, (B, K, H, W)).astype(np.float32))
    want = deform_conv2d_oracle(x, offset, mask, w, bias, pad).numpy()

    got = deform_conv2d(_to_nhwc(x), _to_nhwc(offset), _to_nhwc(mask),
                        _to_hwio(w), jnp.asarray(bias.numpy()), pad)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_deform_int8_gather_bounded_deviation():
    """Opt-in int8 corner-stack (Options.birefnet_int8_deform): the sampled
    activations are quantised to 8 bits before the gather — assert the conv
    output deviates from the exact path by < 2% of the output range
    (measured ~0.7% on this seed; the quantisation step is absmax/127)."""
    rng = np.random.default_rng(0)
    B, H, W, C, O, ks = 1, 14, 15, 24, 20, 3
    K = ks * ks
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    offset = jnp.asarray(
        (rng.standard_normal((B, H, W, 2 * K)) * 2).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 2, (B, H, W, K)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((ks, ks, C, O)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(O).astype(np.float32))
    exact = np.asarray(deform_conv2d(x, offset, mask, w, b, padding=1))
    q = np.asarray(deform_conv2d(x, offset, mask, w, b, padding=1,
                                 int8_gather=True))
    dev = np.abs(exact - q).max() / np.abs(exact).max()
    assert dev < 0.02, dev


def test_birefnet_int8_deform_option_wiring():
    """Options.birefnet_int8_deform reaches the model config (both the full
    and the slim hermetic-test configs)."""
    import os

    import dlimgedit_tpu as dl
    from dlimgedit_tpu.runtime.birefnet import load_birefnet

    env = dl.Environment(dl.Options(backend=dl.Backend.cpu,
                                    allow_random_weights=True,
                                    birefnet_int8_deform=True))
    old = os.environ.get("DLIMG_BIREFNET_TEST_SLIM")
    os.environ["DLIMG_BIREFNET_TEST_SLIM"] = "1"
    try:
        bundle = load_birefnet(env, "general")
    finally:
        if old is None:
            os.environ.pop("DLIMG_BIREFNET_TEST_SLIM", None)
        else:
            os.environ["DLIMG_BIREFNET_TEST_SLIM"] = old
    assert bundle.cfg.deform_int8_gather is True


# ---------------------------------------------------------------------------
# BasicDecBlk torch oracle (upstream decoder_blocks.py, eval mode)
# ---------------------------------------------------------------------------

def synth_deform_sd(rng, sd, prefix, cin, cout, ks):
    sd[f"{prefix}.atrous_conv.offset_conv.weight"] = \
        (rng.standard_normal((2 * ks * ks, cin, ks, ks)) * 0.1).astype(np.float32)
    sd[f"{prefix}.atrous_conv.offset_conv.bias"] = \
        (rng.standard_normal(2 * ks * ks) * 0.1).astype(np.float32)
    sd[f"{prefix}.atrous_conv.modulator_conv.weight"] = \
        (rng.standard_normal((ks * ks, cin, ks, ks)) * 0.1).astype(np.float32)
    sd[f"{prefix}.atrous_conv.modulator_conv.bias"] = \
        (rng.standard_normal(ks * ks) * 0.1).astype(np.float32)
    sd[f"{prefix}.atrous_conv.regular_conv.weight"] = \
        (rng.standard_normal((cout, cin, ks, ks)) / np.sqrt(cin * ks * ks)
         ).astype(np.float32)
    synth_bn_sd(rng, sd, f"{prefix}.bn", cout)


def synth_bn_sd(rng, sd, prefix, c):
    sd[f"{prefix}.weight"] = (rng.uniform(0.5, 1.5, c)).astype(np.float32)
    sd[f"{prefix}.bias"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.running_mean"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.running_var"] = (np.abs(rng.standard_normal(c)) + 0.5).astype(np.float32)


def synth_conv_sd(rng, sd, prefix, cin, cout, ks, bias=True):
    sd[f"{prefix}.weight"] = (rng.standard_normal((cout, cin, ks, ks))
                              / np.sqrt(cin * ks * ks)).astype(np.float32)
    if bias:
        sd[f"{prefix}.bias"] = (rng.standard_normal(cout) * 0.1).astype(np.float32)


def synth_dec_blk_sd(rng, cin, cout, inter=8, channelster=12,
                     kernel_sizes=(1, 3)):
    sd = {}
    synth_conv_sd(rng, sd, "blk.conv_in", cin, inter, 3)
    synth_bn_sd(rng, sd, "blk.bn_in", inter)
    synth_deform_sd(rng, sd, "blk.dec_att.aspp1", inter, channelster, 1)
    for i, ks in enumerate(kernel_sizes):
        synth_deform_sd(rng, sd, f"blk.dec_att.aspp_deforms.{i}", inter,
                        channelster, ks)
    synth_conv_sd(rng, sd, "blk.dec_att.global_avg_pool.1", inter,
                  channelster, 1, bias=False)
    synth_bn_sd(rng, sd, "blk.dec_att.global_avg_pool.2", channelster)
    n_branch = 2 + len(kernel_sizes)
    synth_conv_sd(rng, sd, "blk.dec_att.conv1", n_branch * channelster, inter,
                  1, bias=False)
    synth_bn_sd(rng, sd, "blk.dec_att.bn1", inter)
    synth_conv_sd(rng, sd, "blk.conv_out", inter, cout, 3)
    synth_bn_sd(rng, sd, "blk.bn_out", cout)
    return sd


def _t(sd, k):
    return torch.from_numpy(sd[k])


def conv_t(sd, p, x, pad=0):
    return F.conv2d(x, _t(sd, f"{p}.weight"),
                    _t(sd, f"{p}.bias") if f"{p}.bias" in sd else None,
                    1, pad)


def bn_t(sd, p, x):
    return F.batch_norm(x, _t(sd, f"{p}.running_mean"),
                        _t(sd, f"{p}.running_var"), _t(sd, f"{p}.weight"),
                        _t(sd, f"{p}.bias"), False, 0.0, 1e-5)


def deform_module_t(sd, p, x, ks):
    pad = ks // 2
    offset = conv_t(sd, f"{p}.atrous_conv.offset_conv", x, pad)
    modulator = 2.0 * torch.sigmoid(
        conv_t(sd, f"{p}.atrous_conv.modulator_conv", x, pad))
    y = deform_conv2d_oracle(x, offset, modulator,
                             _t(sd, f"{p}.atrous_conv.regular_conv.weight"),
                             None, pad)
    return F.relu(bn_t(sd, f"{p}.bn", y))


def dec_blk_oracle(sd, x, kernel_sizes=(1, 3)):
    """BasicDecBlk forward (eval), NCHW."""
    x = F.relu(bn_t(sd, "blk.bn_in", conv_t(sd, "blk.conv_in", x, 1)))
    branches = [deform_module_t(sd, "blk.dec_att.aspp1", x, 1)]
    for i, ks in enumerate(kernel_sizes):
        branches.append(deform_module_t(sd, f"blk.dec_att.aspp_deforms.{i}",
                                        x, ks))
    gap = x.mean((2, 3), keepdim=True)
    gap = F.relu(bn_t(sd, "blk.dec_att.global_avg_pool.2",
                      conv_t(sd, "blk.dec_att.global_avg_pool.1", gap)))
    gap = F.interpolate(gap, size=x.shape[2:], mode="bilinear",
                        align_corners=True)
    y = torch.cat(branches + [gap], 1)
    y = F.relu(bn_t(sd, "blk.dec_att.bn1", conv_t(sd, "blk.dec_att.conv1", y)))
    return bn_t(sd, "blk.bn_out", conv_t(sd, "blk.conv_out", y, 1))


def test_basic_dec_blk_parity():
    from dlimgedit_tpu.convert.birefnet import _dec_blk

    rng = np.random.default_rng(2)
    cin, cout = 10, 6
    ksizes = (1, 3)
    sd = synth_dec_blk_sd(rng, cin, cout, kernel_sizes=ksizes)
    x = torch.from_numpy(rng.standard_normal((1, cin, 12, 14)).astype(np.float32))
    with torch.no_grad():
        want = dec_blk_oracle(sd, x, ksizes).numpy()

    params = jax.tree_util.tree_map(jnp.asarray, _dec_blk(sd, "blk"))
    cfg = BiRefNetConfig(aspp_kernel_sizes=ksizes, dec_inter_channels=8,
                         aspp_channelster=12)
    got = _apply_dec_blk(params, _to_nhwc(x), cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Resize + patch layout oracles
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [((6, 8), (12, 16)), ((12, 16), (6, 8)),
                                   ((5, 7), (9, 4)), ((1, 1), (4, 4))])
def test_resize_align_corners_vs_torch(shape):
    (H, W), (h, w) = shape
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(h, w), mode="bilinear",
                         align_corners=True).numpy()
    got = resize_align_corners(jnp.asarray(x.transpose(0, 2, 3, 1)), (h, w))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5)


def get_patches_batch_oracle(x, tile):
    """Upstream Decoder.get_patches_batch (NCHW)."""
    patches_batch = []
    for idx in range(x.shape[0]):
        columns_x = torch.split(x[idx], tile, dim=-1)
        patches_x = []
        for column_x in columns_x:
            patches_x += [p.unsqueeze(0)
                          for p in torch.split(column_x, tile, dim=-2)]
        patches_batch.append(torch.cat(patches_x, dim=1))
    return torch.cat(patches_batch, dim=0)


def test_get_patches_layout_vs_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 8, 12)).astype(np.float32)
    want = get_patches_batch_oracle(torch.from_numpy(x), 4).numpy()
    got = _get_patches(jnp.asarray(x.transpose(0, 2, 3, 1)), 4)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=0)


# ---------------------------------------------------------------------------
# Full-checkpoint conversion: structural round-trip
# ---------------------------------------------------------------------------

def synth_birefnet_sd(rng, swin: SwinConfig, cfg: BiRefNetConfig):
    """Full upstream-layout state dict (backbone + decoder) at the widths
    implied by `swin`/`cfg`."""
    sd = {}

    def lin(prefix, cin, cout):
        sd[f"{prefix}.weight"] = rng.standard_normal(
            (cout, cin)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def ln(prefix, dim):
        sd[f"{prefix}.weight"] = np.ones(dim, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(dim, np.float32)

    # Backbone (standard Swin-v1 layout under bb.)
    sd["bb.patch_embed.proj.weight"] = rng.standard_normal(
        (swin.embed_dim, 3, 4, 4)).astype(np.float32)
    sd["bb.patch_embed.proj.bias"] = rng.standard_normal(
        swin.embed_dim).astype(np.float32)
    ln("bb.patch_embed.norm", swin.embed_dim)
    for i in range(4):
        dim = swin.stage_dim(i)
        for j in range(swin.depths[i]):
            b = f"bb.layers.{i}.blocks.{j}"
            ln(f"{b}.norm1", dim)
            lin(f"{b}.attn.qkv", dim, 3 * dim)
            lin(f"{b}.attn.proj", dim, dim)
            sd[f"{b}.attn.relative_position_bias_table"] = \
                rng.standard_normal(((2 * swin.window - 1) ** 2,
                                     swin.num_heads[i])).astype(np.float32)
            ln(f"{b}.norm2", dim)
            lin(f"{b}.mlp.fc1", dim, 4 * dim)
            lin(f"{b}.mlp.fc2", 4 * dim, dim)
        ln(f"bb.norm{i}", dim)
        if i < 3:
            d = f"bb.layers.{i}.downsample"
            ln(f"{d}.norm", 4 * dim)
            sd[f"{d}.reduction.weight"] = rng.standard_normal(
                (2 * dim, 4 * dim)).astype(np.float32)

    ch = cfg.channels
    ci = cfg.dec_inter_channels
    cs = cfg.aspp_channelster
    gc = cfg.gdt_channels

    def dec_blk(prefix, cin, cout):
        synth_conv_sd(rng, sd, f"{prefix}.conv_in", cin, ci, 3)
        synth_bn_sd(rng, sd, f"{prefix}.bn_in", ci)
        synth_deform_sd(rng, sd, f"{prefix}.dec_att.aspp1", ci, cs, 1)
        for i, ks in enumerate(cfg.aspp_kernel_sizes):
            synth_deform_sd(rng, sd, f"{prefix}.dec_att.aspp_deforms.{i}",
                            ci, cs, ks)
        synth_conv_sd(rng, sd, f"{prefix}.dec_att.global_avg_pool.1", ci, cs,
                      1, bias=False)
        synth_bn_sd(rng, sd, f"{prefix}.dec_att.global_avg_pool.2", cs)
        n_branch = 2 + len(cfg.aspp_kernel_sizes)
        synth_conv_sd(rng, sd, f"{prefix}.dec_att.conv1", n_branch * cs, ci,
                      1, bias=False)
        synth_bn_sd(rng, sd, f"{prefix}.dec_att.bn1", ci)
        synth_conv_sd(rng, sd, f"{prefix}.conv_out", ci, cout, 3)
        synth_bn_sd(rng, sd, f"{prefix}.bn_out", cout)

    def simple_convs(prefix, cin, cout):
        synth_conv_sd(rng, sd, f"{prefix}.conv1", cin, 64, 3)
        synth_conv_sd(rng, sd, f"{prefix}.conv_out", 64, cout, 3)

    dec_blk("squeeze_module.0", ch[0] + sum(cfg.cxt), ch[0])
    simple_convs("decoder.ipt_blk5", 2 ** 10 * 3, ch[0] // 8)
    simple_convs("decoder.ipt_blk4", 2 ** 8 * 3, ch[0] // 8)
    simple_convs("decoder.ipt_blk3", 2 ** 6 * 3, ch[1] // 8)
    simple_convs("decoder.ipt_blk2", 2 ** 4 * 3, ch[2] // 8)
    simple_convs("decoder.ipt_blk1", 3, ch[3] // 8)
    dec_blk("decoder.decoder_block4", ch[0] + ch[0] // 8, ch[1])
    dec_blk("decoder.decoder_block3", ch[1] + ch[0] // 8, ch[2])
    dec_blk("decoder.decoder_block2", ch[2] + ch[1] // 8, ch[3])
    dec_blk("decoder.decoder_block1", ch[3] + ch[2] // 8, ch[3] // 2)
    for i in range(2, 5):
        synth_conv_sd(rng, sd, f"decoder.lateral_block{i}.conv",
                      ch[5 - i], ch[5 - i], 1)
        synth_conv_sd(rng, sd, f"decoder.gdt_convs_{i}.0", ch[5 - i], gc, 3)
        synth_bn_sd(rng, sd, f"decoder.gdt_convs_{i}.1", gc)
        synth_conv_sd(rng, sd, f"decoder.gdt_convs_attn_{i}.0", gc, 1, 1)
        # training-only heads the converter must ignore
        synth_conv_sd(rng, sd, f"decoder.conv_ms_spvn_{i}", ch[5 - i], 1, 1)
        synth_conv_sd(rng, sd, f"decoder.gdt_convs_pred_{i}.0", gc, 1, 1)
    synth_conv_sd(rng, sd, "decoder.conv_out1.0",
                  ch[3] // 2 + ch[3] // 8, 1, 1)
    return sd


def test_full_conversion_structure_matches_init():
    from dlimgedit_tpu.convert.birefnet import convert_checkpoint
    from dlimgedit_tpu.utils.pytree_io import flatten_tree

    swin = SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                      num_heads=(2, 2, 2, 2), window=4)
    cfg = BiRefNetConfig(img_size=64, swin_cfg=swin, dec_inter_channels=8,
                         aspp_channelster=12, gdt_channels=4,
                         aspp_kernel_sizes=(1, 3))
    rng = np.random.default_rng(5)
    sd = synth_birefnet_sd(rng, swin, cfg)
    converted = convert_checkpoint(sd)
    reference = init_birefnet(jax.random.PRNGKey(0), cfg)

    flat_c = flatten_tree(converted)
    flat_r = flatten_tree(jax.tree_util.tree_map(np.asarray, reference))
    assert set(flat_c.keys()) == set(flat_r.keys()), (
        sorted(set(flat_r) - set(flat_c))[:5],
        sorted(set(flat_c) - set(flat_r))[:5])
    for k in flat_r:
        assert flat_c[k].shape == flat_r[k].shape, (
            k, flat_c[k].shape, flat_r[k].shape)


def test_converted_birefnet_runs():
    """Converted tree drives the full inference graph end to end."""
    from dlimgedit_tpu.convert.birefnet import convert_checkpoint

    swin = SwinConfig(embed_dim=16, depths=(1, 1, 1, 1),
                      num_heads=(2, 2, 2, 2), window=4)
    cfg = BiRefNetConfig(img_size=64, swin_cfg=swin, dec_inter_channels=8,
                         aspp_channelster=12, gdt_channels=4,
                         aspp_kernel_sizes=(1, 3))
    rng = np.random.default_rng(6)
    sd = synth_birefnet_sd(rng, swin, cfg)
    # Rescale backbone weights for numerical sanity (they are std-1 random).
    sd = {k: (v * 0.05 if v.ndim >= 2 else v) for k, v in sd.items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_checkpoint(sd))
    from dlimgedit_tpu.models.birefnet import birefnet_apply

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out = birefnet_apply(params, x, cfg)
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()
