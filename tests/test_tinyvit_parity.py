"""Numerical TinyViT parity: convert a synthetic (but *executed*) torch
MobileSAM state dict and assert the JAX encoder reproduces a hand-written
torch oracle that follows upstream tiny_vit_sam.py semantics.

The oracle is written directly against the upstream torch layouts (NCHW
convs, eval-mode BatchNorm, (B, L, C) token windows, inline LeViT bias-index
construction) — independently of dlimgedit_tpu.models.tinyvit — so a layout
or indexing bug in the JAX port (window transpose order, bias-offset
enumeration, stride-1 merge, BN folding) fails this test even though both
sides share no code. Reference anchor: the encoder the reference exports,
/root/reference/script/export_models.py:21-27.

Coverage at img_size=80 (patch res 20): stage1 ws=7 on 10x10 (padded 2x2
windows), stage2 ws=14 on 5x5 (padded single window), stride-1 merge into
stage3, stage3 ws=7 on 5x5 (padded), MBConv stage, both necks.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dlimgedit_tpu.convert.mobile_sam import convert_checkpoint
from dlimgedit_tpu.models.tinyvit import TinyViTConfig, tiny_vit_apply

from test_convert_official import synth_mobile_sam_state_dict

IMG = 80


def _rescale(sd):
    """Scale random weights to ~unit-variance activations so a 12-block
    forward stays in a numerically comparable range."""
    out = {}
    for k, v in sd.items():
        if k.endswith(".c.weight") or (k.endswith(".weight") and v.ndim == 4):
            out[k] = v / np.sqrt(np.prod(v.shape[1:]))
        elif k.endswith(".weight") and v.ndim == 2:
            out[k] = v / np.sqrt(v.shape[1])
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# Torch oracle (upstream tiny_vit_sam.py semantics, NCHW)
# ---------------------------------------------------------------------------

def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k], np.float32))


def conv_bn_t(sd, p, x, stride=1, pad=0, groups=1):
    x = F.conv2d(x, _t(sd, f"{p}.c.weight"), None, stride, pad, 1, groups)
    return F.batch_norm(x, _t(sd, f"{p}.bn.running_mean"),
                        _t(sd, f"{p}.bn.running_var"),
                        _t(sd, f"{p}.bn.weight"), _t(sd, f"{p}.bn.bias"),
                        False, 0.0, 1e-5)


def ln_t(sd, p, x):
    return F.layer_norm(x, (x.shape[-1],), _t(sd, f"{p}.weight"),
                        _t(sd, f"{p}.bias"))


def lin_t(sd, p, x):
    return F.linear(x, _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"))


def bias_idxs_t(ws):
    """LeViT offset table, constructed inline (upstream Attention.__init__)."""
    points = list(itertools.product(range(ws), range(ws)))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return torch.LongTensor(idxs).view(n, n)


def attention_t(sd, p, x, nh, ws):
    """x: (B, N, C) tokens -> (B, N, C)."""
    B, N, C = x.shape
    kd = C // nh
    x = ln_t(sd, f"{p}.norm", x)
    qkv = lin_t(sd, f"{p}.qkv", x)
    q, k, v = qkv.view(B, N, nh, -1).split([kd, kd, kd], dim=3)
    q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
    bias = _t(sd, f"{p}.attention_biases")[:, bias_idxs_t(ws)]
    attn = (q @ k.transpose(-2, -1)) * (kd ** -0.5) + bias
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, nh * kd)
    return lin_t(sd, f"{p}.proj", out)


def block_t(sd, p, x, nh, ws, H, W):
    """TinyViTBlock on (B, L, C) tokens (upstream forward)."""
    B, L, C = x.shape
    res_x = x
    if H == ws and W == ws:
        x = attention_t(sd, f"{p}.attn", x, nh, ws)
    else:
        x = x.view(B, H, W, C)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        pH, pW = H + pad_b, W + pad_r
        nH, nW = pH // ws, pW // ws
        x = (x.view(B, nH, ws, nW, ws, C).transpose(2, 3)
             .reshape(B * nH * nW, ws * ws, C))
        x = attention_t(sd, f"{p}.attn", x, nh, ws)
        x = (x.view(B, nH, nW, ws, ws, C).transpose(2, 3)
             .reshape(B, pH, pW, C))
        if pad_b or pad_r:
            x = x[:, :H, :W].contiguous()
        x = x.view(B, L, C)
    x = res_x + x
    x = x.transpose(1, 2).reshape(B, C, H, W)
    x = conv_bn_t(sd, f"{p}.local_conv", x, pad=1, groups=C)
    x = x.view(B, C, L).transpose(1, 2)
    mlp = ln_t(sd, f"{p}.mlp.norm", x)
    mlp = lin_t(sd, f"{p}.mlp.fc2", F.gelu(lin_t(sd, f"{p}.mlp.fc1", mlp)))
    return x + mlp


def layer_norm_2d_t(sd, p, x, eps=1e-6):
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + eps)
    return _t(sd, f"{p}.weight")[:, None, None] * x + \
        _t(sd, f"{p}.bias")[:, None, None]


def tiny_vit_oracle(sd, x, cfg: TinyViTConfig):
    """x: (B, 3, S, S) NCHW -> (B, 256, S/16, S/16)."""
    e = "image_encoder."
    x = F.gelu(conv_bn_t(sd, f"{e}patch_embed.seq.0", x, stride=2, pad=1))
    x = conv_bn_t(sd, f"{e}patch_embed.seq.2", x, stride=2, pad=1)
    res = cfg.img_size // 4
    for i in range(4):
        for j in range(cfg.depths[i]):
            b = f"{e}layers.{i}.blocks.{j}"
            if i == 0:
                shortcut = x
                h = x.shape[1] * 4
                x = F.gelu(conv_bn_t(sd, f"{b}.conv1", x))
                x = F.gelu(conv_bn_t(sd, f"{b}.conv2", x, pad=1, groups=h))
                x = conv_bn_t(sd, f"{b}.conv3", x)
                x = F.gelu(x + shortcut)
            else:
                B, C = x.shape[0], x.shape[1]
                tokens = x.view(B, C, res * res).transpose(1, 2)
                tokens = block_t(sd, b, tokens, cfg.num_heads[i],
                                 cfg.window_sizes[i], res, res)
                x = tokens.transpose(1, 2).reshape(B, C, res, res)
        if i < 3:
            d = f"{e}layers.{i}.downsample"
            out_dim = cfg.embed_dims[i + 1]
            stride = 1 if out_dim in (320, 448, 576) else 2
            x = F.gelu(conv_bn_t(sd, f"{d}.conv1", x))
            x = F.gelu(conv_bn_t(sd, f"{d}.conv2", x, stride=stride, pad=1,
                                 groups=out_dim))
            x = conv_bn_t(sd, f"{d}.conv3", x)
            res = x.shape[-1]
    x = F.conv2d(x, _t(sd, f"{e}neck.0.weight"))
    x = layer_norm_2d_t(sd, f"{e}neck.1", x)
    x = F.conv2d(x, _t(sd, f"{e}neck.2.weight"), padding=1)
    x = layer_norm_2d_t(sd, f"{e}neck.3", x)
    return x


# ---------------------------------------------------------------------------
# The parity test
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def oracle_case():
    """(state dict, input NHWC, oracle output NHWC) — computed once."""
    rng = np.random.default_rng(7)
    sd = _rescale(synth_mobile_sam_state_dict(rng))
    cfg = TinyViTConfig(img_size=IMG)
    x = rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        want = tiny_vit_oracle(sd, torch.from_numpy(x).permute(0, 3, 1, 2),
                               cfg)
    return sd, x, want.permute(0, 2, 3, 1).numpy(), cfg


def test_tinyvit_numerical_parity(oracle_case):
    sd, x, want, cfg = oracle_case
    params = convert_checkpoint(sd, "mobile_sam")["encoder"]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    got = np.asarray(tiny_vit_apply(params, jnp.asarray(x), cfg))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_tinyvit_parity_catches_bias_order_bug(oracle_case):
    """Meta-test: a permuted bias-offset table must fail parity — i.e. the
    parity test has teeth for exactly the class of bug VERDICT.md #3 names."""
    sd, x, want, cfg = oracle_case

    # Corrupt: permute the learned per-offset biases (simulates a wrong
    # offset-enumeration order in the port).
    bad = dict(sd)
    for k in bad:
        if k.endswith("attention_biases"):
            v = bad[k]
            perm = np.roll(np.arange(v.shape[1]), 1)
            bad[k] = v[:, perm]
    params = convert_checkpoint(bad, "mobile_sam")["encoder"]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    got = np.asarray(tiny_vit_apply(params, jnp.asarray(x), cfg))
    assert not np.allclose(got, want, atol=2e-3, rtol=2e-3)
