"""BiRefNet (lite) — dichotomous foreground segmentation, in pure JAX.

Re-implements, TPU-natively, the full inference graph the reference runs as
birefnet_{cpu,gpu}.onnx (the onnx-community/BiRefNet_lite export of upstream
ZhengPeng7/BiRefNet, /root/reference/models/segmentation/CMakeLists.txt:19-28;
pipeline in /root/reference/src/segmentation.cpp:221-270). Upstream
configuration for the released checkpoints (BiRefNet config.py):

  backbone        swin_v1_tiny (lite) — 4-level pyramid [96, 192, 384, 768]
  mul_scl_ipt     'cat'  — backbone also run on the half-res image, features
                  upsampled (bilinear, align_corners=True) and concatenated:
                  lateral channels double to [192, 384, 768, 1536]
  cxt_num         3      — x1/x2/x3 downsampled onto x4 and concatenated
  squeeze_block   BasicDecBlk_x1 on the deepest level
  dec_blk         BasicDecBlk (conv3x3+BN+ReLU -> ASPPDeformable -> conv3x3+BN)
  dec_att         ASPPDeformable — 1x1 + {1,3,7} modulated deformable branches
                  + global-average branch, concat -> 1x1+BN+ReLU
  dec_ipt (split) image-pyramid inputs: the input image, tiled into the
                  channel dim at each decoder scale, through SimpleConvs
  out_ref         gdt attention gates (conv3x3+BN+ReLU -> 1x1 -> sigmoid)
                  multiply p4/p3/p2 at inference

All BatchNorms are eval-mode and folded into the preceding conv at
conversion time (convert/birefnet.py), so every conv here is plain w (+b).
Deformable sampling is exact (ops/deform.py, torchvision semantics) — not an
approximation. Output contract matches the reference: logits -> sigmoid ->
uint8. Parity: tests/test_birefnet_parity.py (torch oracle).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    HIGHEST,
    Params,
    conv2d,
    kaiming_uniform_conv,
    relu,
)
from .swin import SWIN_PRESETS, SwinConfig, init_swin, swin_apply


@dataclass(frozen=True)
class BiRefNetConfig:
    img_size: int = 1024
    backbone: str = "swin_v1_tiny"
    mul_scl_ipt: str = "cat"          # '' disables the half-res branch
    cxt_num: int = 3
    dec_inter_channels: int = 64      # BasicDecBlk inter (dec_channels_inter
    #                                   'fixed')
    aspp_channelster: int = 256       # ASPPDeformable branch width
    aspp_kernel_sizes: Tuple[int, ...] = (1, 3, 7)
    gdt_channels: int = 16
    # Opt-in int8 corner-stack for the deformable-sampling gathers (half the
    # gather bytes at the measured bandwidth floor; bounded approximation —
    # ops/deform._corner_stack). Wired from Options.birefnet_int8_deform.
    deform_int8_gather: bool = False
    # Tests may substitute a narrow Swin; None -> SWIN_PRESETS[backbone].
    swin_cfg: Optional[SwinConfig] = None

    @property
    def swin(self) -> SwinConfig:
        return self.swin_cfg or SWIN_PRESETS[self.backbone]

    @property
    def channels(self) -> Tuple[int, ...]:
        """Deepest-first lateral channels (doubled under mul_scl_ipt='cat')."""
        d = self.swin.embed_dim
        ch = (8 * d, 4 * d, 2 * d, d)
        if self.mul_scl_ipt == "cat":
            ch = tuple(2 * c for c in ch)
        return ch

    @property
    def cxt(self) -> Tuple[int, ...]:
        """Context channels appended to x4 (config.py: laterals[1:] reversed,
        last cxt_num)."""
        if not self.cxt_num:
            return ()
        return tuple(self.channels[1:][::-1][-self.cxt_num:])


# ---------------------------------------------------------------------------
# align_corners=True bilinear resize (matrix form — two MXU matmuls)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ac_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) bilinear matrix with torch align_corners=True mapping:
    src = i * (n_in - 1) / (n_out - 1)."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        m[:, 0] = 1.0
        return m
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(pos).astype(np.int64)
    i0 = np.minimum(i0, n_in - 1)
    f = pos - i0
    i1 = np.minimum(i0 + 1, n_in - 1)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), (1.0 - f).astype(np.float32))
    np.add.at(m, (rows, i1), f.astype(np.float32))
    return m


def resize_align_corners(x: jnp.ndarray, size_hw: Tuple[int, int]
                         ) -> jnp.ndarray:
    """(B, H, W, C) -> (B, h, w, C), bilinear, align_corners=True (the
    interpolation mode used throughout upstream BiRefNet)."""
    B, H, W, C = x.shape
    h, w = size_hw
    if (H, W) == (h, w):
        return x
    dt = x.dtype
    R = jnp.asarray(_ac_matrix(h, H))
    Cm = jnp.asarray(_ac_matrix(w, W))
    y = jnp.einsum("ih,bhwc->biwc", R, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32, precision=HIGHEST)
    y = jnp.einsum("biwc,jw->bijc", y, Cm,
                   preferred_element_type=jnp.float32, precision=HIGHEST)
    return y.astype(dt)


# ---------------------------------------------------------------------------
# Initialisers
# ---------------------------------------------------------------------------

def _init_conv_b(key, cin, cout, ks, dtype, zero: bool = False) -> Params:
    if zero:
        return {"w": jnp.zeros((ks, ks, cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}
    return {"w": kaiming_uniform_conv(key, (ks, ks, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


def _init_deform(key, cin, cout, ks, dtype) -> Params:
    """_ASPPModuleDeformable: offset/modulator convs (zero-init, upstream)
    + regular conv (BN folded -> w, b)."""
    k1, = jax.random.split(key, 1)
    return {
        "offset": _init_conv_b(key, cin, 2 * ks * ks, ks, dtype, zero=True),
        "modulator": _init_conv_b(key, cin, ks * ks, ks, dtype, zero=True),
        "conv": _init_conv_b(k1, cin, cout, ks, dtype),
    }


def _init_aspp(key, cin, cfg: BiRefNetConfig, dtype) -> Params:
    cs = cfg.aspp_channelster
    ks = jax.random.split(key, len(cfg.aspp_kernel_sizes) + 3)
    n_branch = 2 + len(cfg.aspp_kernel_sizes)
    return {
        "aspp1": _init_deform(ks[0], cin, cs, 1, dtype),
        "deforms": [_init_deform(ks[1 + i], cin, cs, s, dtype)
                    for i, s in enumerate(cfg.aspp_kernel_sizes)],
        "gap": _init_conv_b(ks[-2], cin, cs, 1, dtype),
        "proj": _init_conv_b(ks[-1], n_branch * cs, cin, 1, dtype),
    }


def _init_dec_blk(key, cin, cout, cfg: BiRefNetConfig, dtype) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    ci = cfg.dec_inter_channels
    return {
        "conv_in": _init_conv_b(k1, cin, ci, 3, dtype),
        "aspp": _init_aspp(k2, ci, cfg, dtype),
        "conv_out": _init_conv_b(k3, ci, cout, 3, dtype),
    }


def _init_simple_convs(key, cin, cout, dtype, inter: int = 64) -> Params:
    k1, k2 = jax.random.split(key)
    return {"conv1": _init_conv_b(k1, cin, inter, 3, dtype),
            "conv_out": _init_conv_b(k2, inter, cout, 3, dtype)}


def init_birefnet(key, cfg: BiRefNetConfig = BiRefNetConfig(),
                  dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 24)
    ch = cfg.channels
    gc = cfg.gdt_channels
    dec: Params = {
        "ipt_blk5": _init_simple_convs(ks[2], 2 ** 10 * 3, ch[0] // 8, dtype),
        "ipt_blk4": _init_simple_convs(ks[3], 2 ** 8 * 3, ch[0] // 8, dtype),
        "ipt_blk3": _init_simple_convs(ks[4], 2 ** 6 * 3, ch[1] // 8, dtype),
        "ipt_blk2": _init_simple_convs(ks[5], 2 ** 4 * 3, ch[2] // 8, dtype),
        "ipt_blk1": _init_simple_convs(ks[6], 3, ch[3] // 8, dtype),
        "dec4": _init_dec_blk(ks[7], ch[0] + ch[0] // 8, ch[1], cfg, dtype),
        "dec3": _init_dec_blk(ks[8], ch[1] + ch[0] // 8, ch[2], cfg, dtype),
        "dec2": _init_dec_blk(ks[9], ch[2] + ch[1] // 8, ch[3], cfg, dtype),
        "dec1": _init_dec_blk(ks[10], ch[3] + ch[2] // 8, ch[3] // 2, cfg,
                              dtype),
        "lat4": _init_conv_b(ks[11], ch[1], ch[1], 1, dtype),
        "lat3": _init_conv_b(ks[12], ch[2], ch[2], 1, dtype),
        "lat2": _init_conv_b(ks[13], ch[3], ch[3], 1, dtype),
        "gdt4": _init_conv_b(ks[14], ch[1], gc, 3, dtype),
        "gdt3": _init_conv_b(ks[15], ch[2], gc, 3, dtype),
        "gdt2": _init_conv_b(ks[16], ch[3], gc, 3, dtype),
        "gdt_attn4": _init_conv_b(ks[17], gc, 1, 1, dtype),
        "gdt_attn3": _init_conv_b(ks[18], gc, 1, 1, dtype),
        "gdt_attn2": _init_conv_b(ks[19], gc, 1, 1, dtype),
        "head": _init_conv_b(ks[20], ch[3] // 2 + ch[3] // 8, 1, 1, dtype),
    }
    return {
        "backbone": init_swin(ks[0], cfg.swin, dtype),
        "squeeze": _init_dec_blk(ks[1], ch[0] + sum(cfg.cxt), ch[0], cfg,
                                 dtype),
        "decoder": dec,
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _conv(p: Params, x: jnp.ndarray, padding: int = 0) -> jnp.ndarray:
    y = conv2d(x, p["w"], padding=padding)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _apply_deform(p: Params, x: jnp.ndarray, ks: int,
                  int8_gather: bool = False) -> jnp.ndarray:
    """_ASPPModuleDeformable: modulated deformable conv (+folded BN) + relu."""
    from ..ops.deform import deform_conv2d

    pad = ks // 2
    offset = _conv(p["offset"], x, padding=pad).astype(jnp.float32)
    modulator = 2.0 * jax.nn.sigmoid(
        _conv(p["modulator"], x, padding=pad).astype(jnp.float32))
    y = deform_conv2d(x, offset, modulator, p["conv"]["w"],
                      p["conv"].get("b"), padding=pad,
                      int8_gather=int8_gather)
    return relu(y)


def _apply_aspp(p: Params, x: jnp.ndarray, cfg: BiRefNetConfig
                ) -> jnp.ndarray:
    """ASPPDeformable (upstream models/modules/aspp.py): 1x1 deform + K
    deform branches + global-average branch -> concat -> 1x1 (+BN) -> relu.

    The 1x1 proj is applied as per-branch weight slices summed
    (proj(cat(b_i)) == sum_i proj_i(b_i) + bias — exact linear split), so
    the n_branch*channelster concat (1280 ch at the block's full spatial
    extent; 168 MB @256²) is never materialised and each branch's slice
    fuses into its producer.  The broadcast GAP branch reduces to a single
    1x1-pixel matmul broadcast-added at the end.  Measured (ledger row
    "+gap+proj" @1024 dec1): 4.47 ms -> see BENCH_NOTES round 4."""
    branches: List[jnp.ndarray] = [
        _apply_deform(p["aspp1"], x, 1, cfg.deform_int8_gather)]
    for bp, s in zip(p["deforms"], cfg.aspp_kernel_sizes):
        branches.append(_apply_deform(bp, x, s, cfg.deform_int8_gather))
    gap = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    gap = relu(_conv(p["gap"], gap.astype(x.dtype)))
    w = p["proj"]["w"]                      # (1, 1, n_branch*cs, cout)
    cs = gap.shape[-1]
    # Cross-branch accumulation in f32 (the fused form accumulated the whole
    # 1280-wide contraction in f32; per-branch splits round each partial to
    # the activation dtype once — keep the running sum in f32).
    y = conv2d(branches[0], w[:, :, :cs, :]).astype(jnp.float32)
    for i, br in enumerate(branches[1:], start=1):
        y = y + conv2d(br, w[:, :, i * cs:(i + 1) * cs, :]).astype(jnp.float32)
    # align_corners=True resize of a 1x1 map == broadcast; its proj slice
    # is a 1x1-pixel matmul broadcast over the block.
    y = y + conv2d(gap, w[:, :, len(branches) * cs:, :]).astype(jnp.float32)
    y = y + p["proj"]["b"].astype(jnp.float32)
    return relu(y).astype(x.dtype)  # dropout: eval-mode identity


def _apply_dec_blk(p: Params, x: jnp.ndarray, cfg: BiRefNetConfig
                   ) -> jnp.ndarray:
    """BasicDecBlk: conv3x3(+bn)+relu -> ASPPDeformable -> conv3x3(+bn)."""
    x = relu(_conv(p["conv_in"], x, padding=1))
    x = _apply_aspp(p["aspp"], x, cfg)
    return _conv(p["conv_out"], x, padding=1)


def _apply_simple_convs(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return _conv(p["conv_out"], _conv(p["conv1"], x, padding=1), padding=1)


def _gdt_gate(dec: Params, idx: int, p: jnp.ndarray) -> jnp.ndarray:
    """out_ref attention gate: p * sigmoid(attn(gdt_convs(p)))."""
    g = relu(_conv(dec[f"gdt{idx}"], p, padding=1))
    attn = jax.nn.sigmoid(_conv(dec[f"gdt_attn{idx}"], g).astype(jnp.float32))
    return p * attn.astype(p.dtype)


def _head_fold(dec: Params, p: jnp.ndarray, x: jnp.ndarray,
               size_hw: Tuple[int, int]) -> jnp.ndarray:
    """Exact linear reassociation of the level-1 tail.

    Upstream (BiRefNet models/birefnet.py Decoder.forward, final block)
    computes  head(cat(resize(p, S), SimpleConvs_ipt1(x)))  with a 1x1 head
    conv and an align_corners bilinear resize — both linear — and
    SimpleConvs has NO nonlinearity between its two convs.  Splitting the
    head weight over the concat and commuting the left half with the
    resize:

        head(cat(up(p), ipt(x))) = up(head_a(p)) + (head_b . ipt)(x) + bias

    where `head_b . conv_out` collapses to ONE 3x3 inter->1 conv
    (w_fold[k,l,i] = sum_c w_out[k,l,i,c] * head_w[c]).  This upsamples ONE
    channel instead of ch[3]//2 (96 for swin-T cat) and never materialises
    the (S, S, ch[3]//2 + ch[3]//8) concat: the dominant cost of the
    level1+head ledger row (48 of 77 ms @1024, 410 of 537 ms @2048).
    Identical math; only f32 reassociation + one fewer intermediate bf16
    round.  Pinned == the naive upstream-order tail by
    tests/test_birefnet.py::test_head_fold_matches_upstream_order_tail."""
    cp = p.shape[-1]
    head_w = dec["head"]["w"]                      # (1, 1, cp + ci, 1)
    wa, wb = head_w[:, :, :cp, :], head_w[0, 0, cp:, 0].astype(jnp.float32)
    a = conv2d(p, wa)                              # (B, s, s, 1)
    a = resize_align_corners(a, size_hw)
    blk = dec["ipt_blk1"]
    w_fold = jnp.einsum("klic,c->kli", blk["conv_out"]["w"].astype(jnp.float32),
                        wb, precision=HIGHEST)[..., None]
    cb = blk["conv_out"].get("b")
    b_fold = (jnp.dot(cb.astype(jnp.float32), wb, precision=HIGHEST)
              if cb is not None else jnp.zeros((), jnp.float32))
    t = _conv(blk["conv1"], x, padding=1)
    b = conv2d(t, w_fold.astype(t.dtype), padding=1)
    hb = dec["head"].get("b")
    head_b = (hb.astype(jnp.float32) if hb is not None
              else jnp.zeros((), jnp.float32))
    bias = (b_fold + head_b).astype(a.dtype)
    return a + b.astype(a.dtype) + bias


def _get_patches(x: jnp.ndarray, tile: int) -> jnp.ndarray:
    """Decoder.get_patches_batch: split the input image into (tile x tile)
    patches and stack them into channels, column-major (W split outer,
    H split inner — upstream splits along -1 first)."""
    B, H, W, C = x.shape
    nh, nw = H // tile, W // tile
    y = x.reshape(B, nh, tile, nw, tile, C)
    y = y.transpose(0, 2, 4, 3, 1, 5)  # (B, tile, tile, nw, nh, C)
    return y.reshape(B, tile, tile, nw * nh * C)


def birefnet_apply(params: Params, x: jnp.ndarray,
                   cfg: BiRefNetConfig = BiRefNetConfig()) -> jnp.ndarray:
    """x: (B, S, S, 3) ImageNet-normalised pixels -> (B, S, S, 1) logits.
    S must be divisible by 64 (half-res backbone pass at S/2, stride 32)."""
    B, S = x.shape[0], x.shape[1]
    feats = swin_apply(params["backbone"], x, cfg.swin)
    if cfg.mul_scl_ipt == "cat":
        x_half = resize_align_corners(x, (S // 2, S // 2))
        feats_half = swin_apply(params["backbone"], x_half, cfg.swin)
        feats = [jnp.concatenate(
            [f, resize_align_corners(fh, f.shape[1:3])], axis=-1)
            for f, fh in zip(feats, feats_half)]
    x1, x2, x3, x4 = feats

    if cfg.cxt_num:
        ctx = [resize_align_corners(f, x4.shape[1:3]) for f in (x1, x2, x3)]
        x4 = jnp.concatenate(ctx[-cfg.cxt_num:] + [x4], axis=-1)
    x4 = _apply_dec_blk(params["squeeze"], x4, cfg)

    dec = params["decoder"]
    # Level 4 (1/32)
    pat = _get_patches(x, x4.shape[1])
    x4 = jnp.concatenate([x4, _apply_simple_convs(dec["ipt_blk5"], pat)], -1)
    p4 = _apply_dec_blk(dec["dec4"], x4, cfg)
    p4 = _gdt_gate(dec, 4, p4)
    _p4 = resize_align_corners(p4, x3.shape[1:3])
    _p3 = _p4 + _conv(dec["lat4"], x3)

    # Level 3 (1/16)
    pat = _get_patches(x, x3.shape[1])
    _p3 = jnp.concatenate([_p3, _apply_simple_convs(dec["ipt_blk4"], pat)], -1)
    p3 = _apply_dec_blk(dec["dec3"], _p3, cfg)
    p3 = _gdt_gate(dec, 3, p3)
    _p3u = resize_align_corners(p3, x2.shape[1:3])
    _p2 = _p3u + _conv(dec["lat3"], x2)

    # Level 2 (1/8)
    pat = _get_patches(x, x2.shape[1])
    _p2 = jnp.concatenate([_p2, _apply_simple_convs(dec["ipt_blk3"], pat)], -1)
    p2 = _apply_dec_blk(dec["dec2"], _p2, cfg)
    p2 = _gdt_gate(dec, 2, p2)
    _p2u = resize_align_corners(p2, x1.shape[1:3])
    _p1 = _p2u + _conv(dec["lat2"], x1)

    # Level 1 (1/4 -> 1/1): head folded through the resize/concat (exact —
    # see _head_fold).
    pat = _get_patches(x, x1.shape[1])
    _p1 = jnp.concatenate([_p1, _apply_simple_convs(dec["ipt_blk2"], pat)], -1)
    _p1 = _apply_dec_blk(dec["dec1"], _p1, cfg)
    logits = _head_fold(dec, _p1, x, (S, S))
    return logits.astype(jnp.float32)
