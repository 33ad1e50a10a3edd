"""Shared neural-net building blocks (pure-functional JAX, NHWC layouts).

Design notes (TPU-first):
  * Everything is channels-last (NHWC) so convolutions and layernorms map
    directly onto the MXU/VPU without layout transposes.
  * Parameters are plain nested dicts of jnp arrays (pytrees) — trivially
    shardable with jax.sharding and easy to convert from torch state dicts.
  * BatchNorm is folded into a per-channel (scale, bias) affine at
    conversion time — inference-only, like the reference's ORT graphs which
    ship with fused BN. The affine remains trainable for fine-tuning.
  * GELU is the exact erf formulation (torch nn.GELU default), required for
    numerical parity with the upstream checkpoints.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# All matmuls/convs request full input precision; compute cost is controlled
# by the dtype policy instead (bf16 activations/weights on the encoder path
# run the MXU natively). This matters because the default matmul precision
# rounds f32 inputs to bf16, which breaks f32-critical ops.
HIGHEST = jax.lax.Precision.HIGHEST


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with a dtype-following precision policy.

    f32 (CPU / parity tests): exact erf form, matching torch.nn.GELU().
    bf16 (the TPU serving dtype): tanh approximation — its error (<= ~3e-3
    absolute, near |x|~2) is BELOW the bf16 quantisation step (~8e-3 at
    |x|=1), so outputs are indistinguishable at this dtype while the VPU
    drops the erf transcendental chain. Measured on v5e @1024: TinyViT
    encode 6.79 -> 4.84 ms (erf was ~2 ms of the encoder)."""
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)


# ---------------------------------------------------------------------------
# Initialisers
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def kaiming_uniform_conv(key, shape, dtype=jnp.float32):
    """Torch Conv2d default init for an HWIO kernel."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, cin, cout, dtype=jnp.float32):
    """Torch nn.Linear default init: U(-1/sqrt(cin), 1/sqrt(cin))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    w = jax.random.uniform(kw, (cin, cout), dtype, -bound, bound)
    b = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 0,
           groups: int = 1) -> jnp.ndarray:
    """NHWC conv with HWIO kernel (kernel follows the activation dtype)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=HIGHEST,
    )


def conv_transpose2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """NHWC transposed conv with kernel_size == stride (non-overlapping), the
    SAM mask-decoder upscaler case (ConvTranspose2d(k=2, s=2)).

    With k == s this is exactly a per-pixel matmul + pixel-shuffle:
      out[b, s*i+p, s*j+q, o] = sum_c x[b,i,j,c] * w[p,q,c,o]
    which maps straight onto the MXU with no conv-transpose lowering.
    Kernel layout: (k, k, cin, cout) (torch weight.permute(2, 3, 0, 1)).
    """
    assert stride == w.shape[0], (
        f"conv_transpose2d implements the k == s case only; got kernel "
        f"{w.shape[0]} with stride {stride}")
    B, H, W, _ = x.shape
    k = w.shape[0]
    O = w.shape[3]
    y = jnp.einsum("bhwc,pqco->bhwpqo", x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32, precision=HIGHEST).astype(x.dtype)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (B, H, k, W, k, O)
    return y.reshape(B, H * k, W * k, O)


def init_conv(key, cin, cout, ks, groups: int = 1, dtype=jnp.float32) -> Params:
    w = kaiming_uniform_conv(key, (ks, ks, cin // groups, cout), dtype)
    return {"w": w}


def init_conv_bn(key, cin, cout, ks, groups: int = 1, bn_weight_init: float = 1.0,
                 dtype=jnp.float32) -> Params:
    """Conv2d_BN (TinyViT) with the BN folded to (scale, bias).

    A freshly-initialised torch Conv2d_BN in eval mode computes
    ``bn(conv(x))`` with running stats (0, 1), i.e. an affine with
    scale = bn.weight (init ``bn_weight_init``) and bias = bn.bias (init 0) up
    to eps — which is exactly this folded representation.
    """
    return {
        "w": kaiming_uniform_conv(key, (ks, ks, cin // groups, cout), dtype),
        "scale": jnp.full((cout,), bn_weight_init, dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def conv2d_im2col(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
                  padding: int = 0) -> jnp.ndarray:
    """Conv as shifted strided slices + ONE matmul (im2col).

    Measured on v5e (round 2): NOT a win for the TinyViT stem — the 9
    strided passes over the lane-padded NHWC C=3 tensor cost ~5x the native
    conv's true device time (~5.2 vs ~1.1 ms @1024). Kept (with exact-parity
    unit tests) as the building block for geometries where a single fat
    matmul beats XLA's conv lowering; not used by default anywhere."""
    B, H, W, C = x.shape
    kh, kw, _, O = w.shape
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    Ho = (H + 2 * padding - kh) // stride + 1
    Wo = (W + 2 * padding - kw) // stride + 1
    cols = [
        jax.lax.slice(x, (0, i, j, 0),
                      (B, i + (Ho - 1) * stride + 1,
                       j + (Wo - 1) * stride + 1, C),
                      (1, stride, stride, 1))
        for i in range(kh) for j in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)          # (B, Ho, Wo, kh*kw*C)
    wmat = w.astype(x.dtype).reshape(kh * kw * C, O)  # tap-major == cols order
    return jnp.einsum("bhwk,ko->bhwo", patches, wmat,
                      preferred_element_type=jnp.float32,
                      precision=HIGHEST).astype(x.dtype)


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C), channel layout ((r*f+s)*C + c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // f, f, W // f, f, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // f, W // f, f * f * C)


def depth_to_space(x: jnp.ndarray, g: int) -> jnp.ndarray:
    """Inverse of space_to_depth: (B, H, W, g*g*K) -> (B, g*H, g*W, K)."""
    B, H, W, C = x.shape
    K = C // (g * g)
    x = x.reshape(B, H, W, g, g, K).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * g, W * g, K)


def _stem_block_indices(f: int):
    """Static scatter map for conv3x3s2_block: for each (ka, r, kb, s, u, v)
    the flat 0..8 index into the original 3x3 kernel, and a validity mask.

    Derivation: with factor-f space-to-depth blocks and g = f//2 output
    sub-rows per block, output row i = g*a + u reads input rows 2i + dy =
    f*(a-1+ka) + r, so dy = f*ka + r - f - 2u; taps exist iff |dy| <= 1
    (pad-1 3x3), likewise dx. Everything else is a structural zero."""
    g = f // 2
    idx = np.zeros((2, f, 2, f, g, g), np.int32)
    mask = np.zeros((2, f, 2, f, g, g), bool)
    for ka in range(2):
        for r in range(f):
            for u in range(g):
                dy = f * ka + r - f - 2 * u
                if not -1 <= dy <= 1:
                    continue
                for kb in range(2):
                    for s in range(f):
                        for v in range(g):
                            dx = f * kb + s - f - 2 * v
                            if not -1 <= dx <= 1:
                                continue
                            idx[ka, r, kb, s, u, v] = (dy + 1) * 3 + (dx + 1)
                            mask[ka, r, kb, s, u, v] = True
    return idx, mask


def conv3x3s2_block_weights(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """Scatter a (3, 3, C, K) stride-2 pad-1 kernel into the equivalent
    (2, 2, f*f*C, g*g*K) kernel of a 2x2 block conv over the factor-f
    space-to-depth grid (exact reassociation; g = f//2)."""
    C, K = w.shape[2], w.shape[3]
    g = f // 2
    idx, mask = _stem_block_indices(f)
    w2 = jnp.where(jnp.asarray(mask)[..., None, None],
                   w.reshape(9, C, K)[jnp.asarray(idx)],
                   jnp.zeros((), w.dtype))          # (2, f, 2, f, g, g, C, K)
    w2 = w2.transpose(0, 2, 1, 3, 6, 4, 5, 7)       # (ka, kb, r, s, C, u, v, K)
    return w2.reshape(2, 2, f * f * C, g * g * K)


def conv3x3s2_block(x_blocks: jnp.ndarray, w: jnp.ndarray, f: int) -> jnp.ndarray:
    """3x3 stride-2 pad-1 conv expressed over a factor-f space-to-depth grid.

    Input is ALREADY in block layout (B, H/f, W/f, f*f*C); output stays in
    block layout (B, H/f, W/f, g*g*K) with g = f//2 — i.e. the factor-g
    space-to-depth of the conv's (B, H/2, W/2, K) result. Chaining two stem
    convs keeps everything in block layout with one relayout at each end.

    Why: XLA's native conv lowering for the C_in=3 TinyViT stem runs at ~2%
    MFU (lane-padded channels); this trades a bounded FLOP overexpansion
    (16C/9C taps per output) for MXU-shaped contractions. Measured on v5e
    @1024: the full stem drops 1.16 -> 0.49 ms (exact, max|d| ~ 1e-6 f32)."""
    return jax.lax.conv_general_dilated(
        x_blocks, conv3x3s2_block_weights(w, f).astype(x_blocks.dtype),
        window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=HIGHEST)


def conv_bn(params: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0,
            groups: int = 1, im2col: bool = False) -> jnp.ndarray:
    if im2col and groups == 1:
        y = conv2d_im2col(x, params["w"], stride, padding)
    else:
        y = conv2d(x, params["w"], stride, padding, groups)
    return y * params["scale"].astype(y.dtype) + params["bias"].astype(y.dtype)


def init_layer_norm(dim, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis. With NHWC tensors this is also SAM's
    LayerNorm2d (which normalises the channel axis; use eps=1e-6 there).

    Statistics use the one-pass E[x^2] - E[x]^2 form so XLA emits a single
    multi-output reduction fusion over x instead of two dependent passes
    (jnp.var needs the mean first) — profiling showed two-pass LN stats were
    the single largest cost in the big ViT encoders.

    Caveat (input-range assumption): the one-pass form cancels
    catastrophically when |mean| >> std (f32 rounding of mean_sq - mean^2
    can clamp var to 0, blowing y up by rsqrt(eps)). SAM/Swin activations
    at every tested scale keep |mean|/std small enough that the parity
    suites hold; if a future model feeds rows with mean ~1e3 and std <~ 1,
    switch that path to jnp.var (two-pass) or Welford."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean_sq = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(dtype)


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "w_q8" in params:
        # int8 weights AND activations: s8 x s8 -> s32 on the MXU (2x MXU
        # throughput on v5e, half the operand HBM traffic of bf16).
        from ..ops.quant import int8_linear

        return int8_linear(params, x)
    if "w_q" in params:
        # Weight-only int8 (ops/quant.py): dequant fuses into the matmul
        # operand read — half the weight HBM traffic of bf16.
        from ..ops.quant import dequantize_weight

        w = dequantize_weight(params["w_q"], params["w_scale"], x.dtype)
    else:
        w = params["w"].astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32,
                precision=HIGHEST).astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def init_mlp(key, dim, hidden, out=None, dtype=jnp.float32) -> Params:
    out = out or dim
    k1, k2 = jax.random.split(key)
    return {
        "norm": init_layer_norm(dim, dtype),
        "fc1": linear_init(k1, dim, hidden, dtype),
        "fc2": linear_init(k2, hidden, out, dtype),
    }


# ---------------------------------------------------------------------------
# Dtype policy helpers
# ---------------------------------------------------------------------------

def cast_tree(params, dtype):
    """Cast float leaves to `dtype`; int8 quantised weights and their f32
    scales (``w_scale``, computed from f32 weights — ops/quant.py) pass
    through untouched."""
    def cast(path, a):
        if path and getattr(path[-1], "key", None) == "w_scale":
            return a
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a
    return jax.tree_util.tree_map_with_path(cast, params)


def param_count(params) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))
