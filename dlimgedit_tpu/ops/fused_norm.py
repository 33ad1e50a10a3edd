"""Pallas fused LayerNorm over the channel (last) axis, NHWC.

Profiling the big SAM ViT encoders showed LayerNorm as a top cost: the XLA
lowering round-trips the activation through f32 HBM copies between the
stats reductions and the normalise pass. This kernel does one read and one
write per element — stats, normalise, affine all in VMEM, f32 math inside,
activation dtype outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                 # (R, C)
    m = jnp.mean(x, axis=-1, keepdims=True)
    m2 = jnp.mean(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + eps)
    y = (x - m) * inv
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _add_ln_kernel(x_ref, d_ref, scale_ref, bias_ref, s_ref, o_ref, *,
                   eps: float):
    """Residual add + LayerNorm in one pass: s = x + d (written in the
    activation dtype, it IS the residual stream) and o = LN(s)."""
    s = x_ref[...].astype(jnp.float32) + d_ref[...].astype(jnp.float32)
    s_ref[...] = s.astype(s_ref.dtype)
    s = s_ref[...].astype(jnp.float32)  # re-read rounded value: o must be
    # LN of the dtype-rounded sum, bit-matching the unfused add -> LN chain
    m = jnp.mean(s, axis=-1, keepdims=True)
    m2 = jnp.mean(s * s, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + eps)
    y = (s - m) * inv
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _row_blocking(n: int, C: int, block_rows):
    """(rows per program, padded row count) — the ONE copy of the blocking
    heuristic shared by both LN entry points so their perf/padding behavior
    can never diverge. Rows per program: a power of two (multiple of 8, the
    sublane tile, as Mosaic requires), targeting ~2 MB f32 — swept on v5e at
    ViT-H geometry (4096, 1280) with 64-deep measurement chains: 256 rows =
    746 GB/s (91% of HBM peak; 512 rows 603, 1024 rows 618, stock XLA LN
    569). Clamped by n (a small input must not be zero-padded to ~500x its
    size); row counts that don't divide — e.g. TinyViT's 361 windows x 49
    tokens = 17689 rows — are padded up, and padded rows normalise garbage
    the caller slices off."""
    target = block_rows or max(8, (2 * 1024 * 1024) // (C * 4))
    rows = 8
    while rows * 2 <= target and rows < n:
        rows *= 2
    return rows, ((n + rows - 1) // rows) * rows


def fused_layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     eps: float = 1e-6, interpret: bool = False,
                     block_rows: int | None = None) -> jnp.ndarray:
    """LayerNorm over the last axis of an arbitrary-rank tensor.

    (Not jitted itself — always composed inside the caller's jit.)"""
    orig_shape = x.shape
    C = orig_shape[-1]
    n = 1
    for d in orig_shape[:-1]:
        n *= d
    x2 = x.reshape(n, C)
    rows, n_pad = _row_blocking(n, C, block_rows)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(n_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), x.dtype),
        interpret=interpret,
    )(x2, scale, bias)
    if n_pad != n:
        out = out[:n]
    return out.reshape(orig_shape)


def fused_add_layer_norm(x: jnp.ndarray, delta: jnp.ndarray,
                         scale: jnp.ndarray, bias: jnp.ndarray,
                         eps: float = 1e-6, interpret: bool = False,
                         block_rows: int | None = None):
    """Residual add + LayerNorm in ONE kernel pass.

    Returns ``(x + delta, layer_norm(x + delta))``. The ViT residual
    stream does `h = x + a; y = LN(h)` at every half-block — as separate
    ops the add's output round-trips HBM before the (opaque-to-fusion)
    Pallas LN reads it back; fusing saves one full read+write of the
    activation per LN (~21 MB per ViT-H layer-half). The sum is rounded
    to the activation dtype BEFORE the stats so results bit-match the
    unfused add -> LN chain."""
    orig_shape = x.shape
    C = orig_shape[-1]
    n = 1
    for d in orig_shape[:-1]:
        n *= d
    x2 = x.reshape(n, C)
    d2 = delta.reshape(n, C)
    rows, n_pad = _row_blocking(n, C, block_rows)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
        d2 = jnp.pad(d2, ((0, n_pad - n), (0, 0)))
    rspec = pl.BlockSpec((rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM)
    s, out = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=(n_pad // rows,),
        in_specs=[rspec, rspec, cspec, cspec],
        out_specs=[rspec, rspec],
        out_shape=[jax.ShapeDtypeStruct((n_pad, C), x.dtype),
                   jax.ShapeDtypeStruct((n_pad, C), x.dtype)],
        interpret=interpret,
    )(x2, d2, scale, bias)
    if n_pad != n:
        s = s[:n]
        out = out[:n]
    return s.reshape(orig_shape), out.reshape(orig_shape)
