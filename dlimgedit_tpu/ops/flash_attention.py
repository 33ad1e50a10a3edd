"""Pallas TPU attention with in-tile decomposed relative-position bias.

The hot op of the SAM ViT-B/L/H encoders (BASELINE configs 3/4): global
attention over the 64x64 token grid with MViTv2 decomposed rel-pos bias.
The naive XLA lowering materialises the (heads, N, N) f32 bias AND attention
matrices — ~800 MB of HBM traffic per ViT-H layer, measured ~17x off
roofline. This kernel keeps everything quadratic in VMEM: one program per
(batch*head, query-row), scores held as a (w, gh, w) f32 tile, and the bias
reconstructed on the fly from the gathered (h, h, hd)/(w, w, hd) tables:

  bias[i, (yj, xj)] = q_i . rh[yi, yj] + q_i . rw[xi, xj]

With one spatial row per query block, yi is constant, so the rh term is a
(w, gh) matmul broadcast over xj and the rw term a (w, w) tile broadcast
over yj — nothing N x N ever leaves VMEM, and all contractions are
MXU-shaped. No dynamic indexing (Mosaic-friendly); softmax is exact (the
full key row fits in VMEM at SAM scales: s3 is w*N f32 = 1 MB at 64x64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, grid_h: int,
            grid_w: int, scale: float):
    """Block shapes (leading singleton = blocked batch*head dim):
      q_ref:  (1, w, hd)   — query spatial row `qrow`
      k_ref:  (1, N, hd)   — all keys for this head
      v_ref:  (1, N, hd)
      rh_ref: (1, gh, hd)  — rh[qrow] (key-row relative vectors)
      rw_ref: (w, w, hd)   — full width table
      o_ref:  (1, w, hd)
    """
    w = q_ref.shape[1]
    hd = q_ref.shape[2]
    N = grid_h * grid_w
    q = q_ref[0].astype(jnp.float32)                       # (w, hd)
    k = k_ref[0].astype(jnp.float32)                       # (N, hd)
    v = v_ref[0].astype(jnp.float32)                       # (N, hd)

    # Scores: (w, N) — lanes = all keys, MXU-shaped.
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    # Height bias: constant along key columns. bh (w, gh) expanded to (w, N)
    # via a static one-hot selector matmul (key j belongs to key-row j // w).
    rh = rh_ref[0].astype(jnp.float32)                     # (gh, hd)
    bh = jax.lax.dot_general(q, rh, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (w, gh)
    sel_h = (jax.lax.broadcasted_iota(jnp.int32, (grid_h, N), 1) // grid_w
             == jax.lax.broadcasted_iota(jnp.int32, (grid_h, N), 0)
             ).astype(jnp.float32)
    s = s + jax.lax.dot_general(bh, sel_h, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    # Width bias: constant along key rows. bw (w, w) -> (w, N) via the
    # column selector (key j has key-col j % w).
    bw = jnp.sum(q[:, None, :] * rw_ref[...].astype(jnp.float32),
                 axis=-1)                                  # (w, w)
    sel_w = (jax.lax.broadcasted_iota(jnp.int32, (grid_w, N), 1) % grid_w
             == jax.lax.broadcasted_iota(jnp.int32, (grid_w, N), 0)
             ).astype(jnp.float32)
    s = s + jax.lax.dot_general(bw, sel_w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    # Exact softmax over all keys.
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)             # (w, N)

    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid_h", "grid_w", "interpret"))
def flash_attention_relpos(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           rh: jnp.ndarray, rw: jnp.ndarray, *, grid_h: int,
                           grid_w: int, interpret: bool = False
                           ) -> jnp.ndarray:
    """q, k, v: (BH, N, hd) with N == grid_h * grid_w.
    rh: (grid_h, grid_h, hd) gathered height table (rel_pos_h[idx]);
    rw: (grid_w, grid_w, hd). Returns (BH, N, hd), dtype of q."""
    BH, N, hd = q.shape
    assert N == grid_h * grid_w, (N, grid_h, grid_w)
    scale = hd ** -0.5

    kernel = functools.partial(_kernel, grid_h=grid_h, grid_w=grid_w,
                               scale=scale)
    flops = 2 * BH * N * N * hd * 2  # qk^T + pv
    return pl.pallas_call(
        kernel,
        grid=(BH, grid_h),
        in_specs=[
            pl.BlockSpec((1, grid_w, hd), lambda bh, qr: (bh, qr, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hd), lambda bh, qr: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hd), lambda bh, qr: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grid_h, hd), lambda bh, qr: (qr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid_w, grid_w, hd), lambda bh, qr: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, grid_w, hd), lambda bh, qr: (bh, qr, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, N, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=3 * BH * N * hd * 2 + BH * N * hd * 2,
            transcendentals=BH * N * N),
        interpret=interpret,
    )(q, k, v, rh, rw)


def attention_reference(q, k, v, rh, rw, grid_h, grid_w):
    """Dense reference (the naive path) for testing the kernel."""
    BH, N, hd = q.shape
    scale = hd ** -0.5
    qf = q.astype(jnp.float32)
    s = jnp.einsum("bqd,bkd->bqk", qf, k.astype(jnp.float32)) * scale
    qr = qf.reshape(BH, grid_h, grid_w, hd)
    bh = jnp.einsum("bhwc,hkc->bhwk", qr, rh.astype(jnp.float32))
    bw = jnp.einsum("bhwc,wkc->bhwk", qr, rw.astype(jnp.float32))
    bias = (bh[..., :, None] + bw[..., None, :]).reshape(
        BH, grid_h, grid_w, N).reshape(BH, N, N)
    p = jax.nn.softmax(s + bias, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
