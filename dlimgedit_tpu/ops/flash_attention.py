"""Pallas TPU attention with in-tile decomposed relative-position bias.

The hot op of the SAM ViT-B/L/H encoders (BASELINE configs 3/4): attention
with MViTv2 decomposed rel-pos bias, both the 64x64-token *global* layers
and the 14x14 *windowed* layers. The naive XLA lowering materialises the
(batch*heads, N, N) f32 bias AND attention matrices in HBM — measured ~17x
off roofline for ViT-H. This kernel keeps everything quadratic in VMEM.

Bias structure: token i has grid coords (yi, xi) = divmod(i, gw) and
  bias[i, j] = q_i . rh[yi, yj] + q_i . rw[xi, xj]

Each program handles one q-block of BQ tokens against all N keys of its
attention group (a full window, or one head of the global grid). The bias
is rebuilt per tile from *gathered per-token tables* prepared by the caller:
  rh_e[i] = rh[yi]  (N, gh, hd)      rw_e[i] = rw[xi]  (N, gw, hd)
so in-kernel it is two skinny per-row contractions (VPU) expanded to (BQ, N)
by static one-hot selector matmuls (MXU) — no dynamic indexing, no N x N
traffic to HBM, exact softmax (a BQ x N f32 tile fits VMEM at SAM scales).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bhw_ref, o_ref, *, grid_h: int,
            grid_w: int, scale: float):
    """Block shapes (leading singleton = the blocked group dim):
      q_ref:   (1, BQ, hd)       — query block
      k_ref:   (1, N, hd)        — all keys of this attention group
      v_ref:   (1, N, hd)
      bhw_ref: (1, BQ, gh + gw)  — precomputed [q.rh | q.rw] bias halves
      o_ref:   (1, BQ, hd)

    The bias halves are batched matmuls the CALLER runs on the MXU once per
    layer (bh[g,i,y] = q[g,i,:].rh_e[i,y,:]): computing them in-kernel as
    per-row skinny VPU contractions measured ~1.4 us x 1024 programs on the
    ViT-H global layers — about a third of the whole kernel's runtime.
    In-kernel they only need the one-hot expansion to (BQ, N): a SINGLE
    combined selector matmul [bh | bw] @ [sel_h ; sel_w] — one MXU pass per
    output tile where round 2's two separate expansions paid two (measured
    ~20% of ViT-H kernel time back; for the 64x64 global grid the combined
    contraction is exactly gh+gw = 128 lanes)."""
    N = k_ref.shape[1]
    qn = q_ref[0]                                          # (BQ, hd) native
    k = k_ref[0]                                           # (N, hd)
    v = v_ref[0]

    # MXU dot in the native dtype, f32 accumulation. bf16 inputs use the
    # native single-pass MXU; f32 inputs (tests / CPU) request full precision
    # (the default would silently round them to bf16).
    prec = (jax.lax.Precision.HIGHEST if qn.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s = jax.lax.dot_general(qn, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale

    # Combined one-hot selector (shared helper — the grouped and head-fused
    # kernels must always build the IDENTICAL bias expansion).
    sel = _selector_matrix(grid_h, grid_w, N, qn.dtype)
    s = s + jax.lax.dot_general(bhw_ref[0].astype(qn.dtype), sel,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)

    # Exact softmax over all keys (f32), probabilities rounded to the native
    # dtype for the PV matmul (standard flash-attention practice).
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)             # (BQ, N)

    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    o_ref[0] = o.astype(o_ref.dtype)


def _gathered_tables(rh, rw, grid_h, grid_w, dtype):
    """rel_pos tables -> gathered form: rh (2*gh-1, hd) raw table ->
    rh_g (gh, gh, hd) with rh_g[yi, yj] = rh[yi - yj + gh - 1]; same for
    rw along x."""
    idx_h = np.arange(grid_h)[:, None] - np.arange(grid_h)[None, :] + grid_h - 1
    idx_w = np.arange(grid_w)[:, None] - np.arange(grid_w)[None, :] + grid_w - 1
    rh_g = jnp.take(rh, jnp.asarray(idx_h), axis=0)        # (gh, gh, hd)
    rw_g = jnp.take(rw, jnp.asarray(idx_w), axis=0)        # (gw, gw, hd)
    return rh_g.astype(dtype), rw_g.astype(dtype)


def _bias_halves(q, rh_g, rw_g, grid_h, grid_w, prec, mode: str = "grid",
                 out_scale: float = 1.0):
    """[q.rh | q.rw] bias halves, (G, N, gh+gw).

    ``out_scale`` multiplies the f32 einsum result BEFORE the single cast
    to q.dtype (used by the folded-bias kernel, which needs bias/scale so
    the post-matmul ``* scale`` restores it — no extra rounding vs the
    unscaled form).

    mode="grid": two batched matmuls over the grid row / column directly
    from the compact (gh, gh, hd) tables. mode="expand": round-2 form —
    expand the tables to per-token (N, gh+gw, hd) and run one i-batched
    einsum. Interleaved same-process A/B on v5e (round 3): grid wins the
    64x64 global geometry (1.57 vs 1.78 ms/layer — expand materialises a
    40 MB table), expand wins the 14x14 windows (0.38 vs 0.46 ms/layer —
    the tiny tables cost nothing and the single einsum beats two
    badly-batched grid matmuls). flash_attention_relpos picks per
    geometry."""
    G, N, hd = q.shape
    if mode == "expand":
        rh_e = jnp.repeat(rh_g, grid_w, axis=0)            # (N, gh, hd)
        rw_e = jnp.tile(rw_g, (grid_h, 1, 1))              # (N, gw, hd)
        rhw_e = jnp.concatenate([rh_e, rw_e], axis=1)      # (N, gh+gw, hd)
        b = jnp.einsum("gid,iyd->giy", q, rhw_e.astype(q.dtype),
                       preferred_element_type=jnp.float32,
                       precision=prec)
        if out_scale != 1.0:
            b = b * out_scale
        return b.astype(q.dtype)
    q4 = q.reshape(G, grid_h, grid_w, hd)
    bh = jnp.einsum("ghwd,hyd->ghwy", q4, rh_g.astype(q.dtype),
                    preferred_element_type=jnp.float32,
                    precision=prec)                        # (G, gh, gw, gh)
    bw = jnp.einsum("ghwd,wyd->ghwy", q4, rw_g.astype(q.dtype),
                    preferred_element_type=jnp.float32,
                    precision=prec)                        # (G, gh, gw, gw)
    b = jnp.concatenate([bh, bw], axis=-1).reshape(G, N, grid_h + grid_w)
    if out_scale != 1.0:
        b = b * out_scale
    return b.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("grid_h", "grid_w", "block_q",
                                             "interpret", "bias_mode"))
def _attention_grouped(q, k, v, rh_g, rw_g, *, grid_h: int, grid_w: int,
                       block_q: int, interpret: bool = False,
                       bias_mode: str = "grid") -> jnp.ndarray:
    """q, k, v: (G, N, hd) — G independent attention groups over N tokens.
    rh_g: (grid_h, grid_h, hd), rw_g: (grid_w, grid_w, hd) shared across
    groups."""
    G, N, hd = q.shape
    assert N == grid_h * grid_w and N % block_q == 0
    scale = hd ** -0.5
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # Bias halves on the MXU, once per layer (see _kernel docstring).
    bhw = _bias_halves(q, rh_g, rw_g, grid_h, grid_w, prec, mode=bias_mode)
    kernel = functools.partial(_kernel, grid_h=grid_h, grid_w=grid_w,
                               scale=scale)
    nq = N // block_q
    return pl.pallas_call(
        kernel,
        grid=(G, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda g, qb: (g, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hd), lambda g, qb: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hd), lambda g, qb: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, grid_h + grid_w),
                         lambda g, qb: (g, qb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, qb: (g, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * N * N * hd,
            bytes_accessed=4 * G * N * hd * 2,
            transcendentals=G * N * N),
        interpret=interpret,
    )(q, k, v, bhw)


def _selector_matrix(grid_h: int, grid_w: int, N: int, dtype,
                     transposed: bool = False):
    """Combined one-hot selector: row r < gh selects tokens with y == r,
    row gh + r selects tokens with x == r. Arithmetic blend instead of a
    boolean where — Mosaic cannot lower odd-shaped i1 vector selects.
    transposed=True builds the (N, gh + gw) layout directly by swapping
    the iota axes (not via .T, so Mosaic never lowers a real transpose);
    the selector semantics live only here."""
    shape = (N, grid_h + grid_w) if transposed else (grid_h + grid_w, N)
    r_dim, j_dim = (1, 0) if transposed else (0, 1)
    r = jax.lax.broadcasted_iota(jnp.int32, shape, r_dim)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, j_dim)
    is_h = (r < grid_h).astype(dtype)
    m_h = (j // grid_w == r).astype(dtype)
    m_w = (j % grid_w == r - grid_h).astype(dtype)
    return is_h * m_h + (1.0 - is_h) * m_w


def _attend_one_head(qn, k, v, bh, sel, scale, prec, out_dtype):
    """Exact-softmax attention for one head tile; bh = [q.rh | q.rw]."""
    s = jax.lax.dot_general(qn, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale
    s = s + jax.lax.dot_general(bh.astype(qn.dtype), sel,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    return o.astype(out_dtype)


def _selector_matrix_t(grid_h: int, grid_w: int, N: int, dtype):
    """Transposed combined selector (N, gh + gw): column r < gh is one-hot
    on tokens with y == r, column gh + r on tokens with x == r."""
    return _selector_matrix(grid_h, grid_w, N, dtype, transposed=True)


def _attend_one_head_folded(qn, k, v, bh_s, sel_t, scale, prec, out_dtype):
    """Exact-softmax attention with the bias expansion FOLDED into the
    score matmul's contraction: s = ([q | bh/scale] @ [k | sel]^T) * scale.

    Valid when hd + gh + gw <= 128 (every SAM window geometry: 80+28 and
    64+28): the combined contraction rides the SAME 128-lane-padded MXU
    pass the plain q@k^T already pays, so the separate selector matmul —
    whose 28-lane contraction ALSO padded to a full 128-lane pass —
    disappears entirely (one score pass instead of two per head). bh_s is
    bias/scale (from _bias_halves(out_scale=1/scale)); the post-matmul
    * scale restores it, keeping the q.k math bit-identical to the
    unfolded kernel and the bias within one extra f32 multiply."""
    qcat = jnp.concatenate([qn, bh_s.astype(qn.dtype)], axis=-1)
    kcat = jnp.concatenate([k, sel_t], axis=-1)
    s = jax.lax.dot_general(qcat, kcat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec)
    return o.astype(out_dtype)


def _head_loop_kernel_folded(q_ref, k_ref, v_ref, bhw_ref, o_ref, *,
                             grid_h: int, grid_w: int, scale: float):
    """_head_loop_kernel with the folded-bias score matmul (see
    _attend_one_head_folded); bhw_ref carries bias/scale halves."""
    nh = q_ref.shape[1]
    N = k_ref.shape[2]
    dtype = q_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sel_t = _selector_matrix_t(grid_h, grid_w, N, dtype)
    for h in range(nh):
        o_ref[0, h] = _attend_one_head_folded(
            q_ref[0, h], k_ref[0, h], v_ref[0, h], bhw_ref[0, h], sel_t,
            scale, prec, o_ref.dtype)


def _head_loop_kernel(q_ref, k_ref, v_ref, bhw_ref, o_ref, *, grid_h: int,
                      grid_w: int, scale: float):
    """One program = one window, ALL heads looped in-kernel.

    Block shapes: q/k/v_ref (1, nh, N, hd), bhw_ref (1, nh, N, gh+gw),
    o_ref like q. Merging the head axis into the program cuts the grid from
    windows*heads to windows programs (ViT-H: 400 -> 25), amortising
    per-program dispatch over 16 head iterations and building the combined
    selector once per window instead of once per head."""
    nh = q_ref.shape[1]
    N = k_ref.shape[2]
    dtype = q_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sel = _selector_matrix(grid_h, grid_w, N, dtype)
    for h in range(nh):
        o_ref[0, h] = _attend_one_head(q_ref[0, h], k_ref[0, h], v_ref[0, h],
                                       bhw_ref[0, h], sel, scale, prec,
                                       o_ref.dtype)


def _head_loop_kernel_qkv(q_ref, k_ref, v_ref, bhw_ref, o_ref, *,
                          grid_h: int, grid_w: int, scale: float):
    """_head_loop_kernel over a COMBINED qkv operand: q/k/v_ref are three
    (1, 1, nh, N, hd) BlockSpec slices of the same (W, 3, nh, N, hd) array
    (component picked by the index map), so the caller never materialises
    a 3-way split — measured worth ~2 ms of ViT-H @1024 vs slicing q/k/v
    into separate arrays on the host side of the call."""
    nh = q_ref.shape[2]
    N = k_ref.shape[3]
    dtype = q_ref.dtype
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    sel = _selector_matrix(grid_h, grid_w, N, dtype)
    for h in range(nh):
        o_ref[0, h] = _attend_one_head(q_ref[0, 0, h], k_ref[0, 0, h],
                                       v_ref[0, 0, h], bhw_ref[0, h], sel,
                                       scale, prec, o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("grid_h", "grid_w", "heads",
                                             "interpret", "bias_mode",
                                             "n_w", "valid_rows"))
def _attention_head_fused(q, k, v, rh_g, rw_g, *, grid_h: int, grid_w: int,
                          heads: int, interpret: bool = False,
                          bias_mode: str = "grid", n_w: int | None = None,
                          valid_rows: int | None = None) -> jnp.ndarray:
    """Window-per-program variant for small-N geometries; q/k/v (G, N, hd)
    with G == windows * heads, head index fastest (the reshape from
    (B, nh, N, hd) used by the callers).

    n_w / valid_rows (optional): pad-query skip for the BOTTOM row of
    windows. The window partition zero-pads the token grid (SAM semantics:
    pad KEYS participate, pad-QUERY outputs are discarded at unpartition),
    so for the last `n_w` windows only the first `valid_rows` window rows
    carry queries whose outputs survive. Those windows run through a
    second pallas_call whose q/bias/output blocks cover just the leading
    valid_rows*grid_w tokens — zero extra copies (both calls read the same
    HBM operands via BlockSpecs; the skipped output rows are zero-filled,
    and the caller's unpartition crops them). ViT-H @1024: 5 of 25 windows
    drop 84/196 query rows = 8.6% of windowed-attention work."""
    G, N, hd = q.shape
    scale = hd ** -0.5
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # Folded-bias score matmul whenever the combined contraction fits the
    # 128-lane tile the plain q@k^T already pads to (every SAM window
    # geometry) — halves the per-head score-stage MXU passes.
    folded = hd + grid_h + grid_w <= 128
    bhw = _bias_halves(q, rh_g, rw_g, grid_h, grid_w, prec, mode=bias_mode,
                       out_scale=(1.0 / scale if folded else 1.0))
    W = G // heads
    q4 = q.reshape(W, heads, N, hd)
    k4 = k.reshape(W, heads, N, hd)
    v4 = v.reshape(W, heads, N, hd)
    b4 = bhw.reshape(W, heads, N, grid_h + grid_w)
    kernel = functools.partial(
        _head_loop_kernel_folded if folded else _head_loop_kernel,
        grid_h=grid_h, grid_w=grid_w, scale=scale)

    skip = (n_w is not None and valid_rows is not None
            and 0 < valid_rows < grid_h and 0 < n_w < W)
    W_full = W - n_w if skip else W

    def spec(last, nq=N, off=0):
        return pl.BlockSpec((1, heads, nq, last),
                            lambda w, off=off: (w + off, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(n_windows, nq, off):
        return pl.pallas_call(
            kernel,
            grid=(n_windows,),
            in_specs=[spec(hd, nq, off), spec(hd, N, off), spec(hd, N, off),
                      spec(grid_h + grid_w, nq, off)],
            out_specs=pl.BlockSpec((1, heads, nq, hd),
                                   lambda w: (w, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_windows, heads, nq, hd),
                                           q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * n_windows * heads * nq * N * hd,
                bytes_accessed=4 * n_windows * heads * N * hd * 2,
                transcendentals=n_windows * heads * nq * N),
            interpret=interpret,
        )(q4, k4, v4, b4)

    out = call(W_full, N, 0)
    if skip:
        vN = valid_rows * grid_w
        out_bot = call(n_w, vN, W_full)
        out_bot = jnp.pad(out_bot, ((0, 0), (0, 0), (0, N - vN), (0, 0)))
        out = jnp.concatenate([out, out_bot], axis=0)
    return out.reshape(G, N, hd)


@functools.partial(jax.jit, static_argnames=("grid_h", "grid_w",
                                              "interpret", "bias_mode"))
def windowed_attention_qkv(qkv, rh, rw, *, grid_h: int, grid_w: int,
                           interpret: bool = False,
                           bias_mode: str = "expand") -> jnp.ndarray:
    """Head-fused windowed attention over a COMBINED qkv tensor.

    qkv: (W, 3, nh, N, hd) window-major; rh/rw raw (2*g-1, hd) or gathered
    (g, g, hd) tables. Returns (W, nh, N, hd). The kernel receives q/k/v
    as three BlockSpec slices of the same operand, so no separate q/k/v
    arrays are materialised in HBM.

    TRIED AND REJECTED for the ViT windowed layers (round 3, on-chip):
    restructuring _vit_attn_branch to project qkv on the UNPADDED token
    grid (4096 vs 4900 tokens at ws=14, bias-valued pad via fused where)
    and feed this kernel measured ViT-H 58.9 ms and ViT-L 35.0 vs the
    partition-first baseline's 54.2 / 32.8 — the 8D relayout into
    (W, 3, nh, N, hd) does not fuse with the qkv matmul epilogue the way
    the per-window matmul + (2,0,3,1,4) transpose chain does, and the
    theoretical 16% matmul saving drowns in the extra relayout pass.
    (An intermediate variant slicing q/k/v into three arrays host-side
    was worse still: 57.3 with +3 ms of split copies.) Kept with a unit
    test as the measured record; the production path remains
    _vit_attention via flash_attention_relpos."""
    W, _, nh, N, hd = qkv.shape
    assert N == grid_h * grid_w
    scale = hd ** -0.5
    prec = (jax.lax.Precision.HIGHEST if qkv.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if rh.ndim == 2:
        rh_g, rw_g = _gathered_tables(rh, rw, grid_h, grid_w, qkv.dtype)
    else:
        rh_g, rw_g = rh.astype(qkv.dtype), rw.astype(qkv.dtype)
    # Bias halves from the q slice: a strided read fused into the einsum,
    # not a copy.
    q = qkv[:, 0].reshape(W * nh, N, hd)
    bhw = _bias_halves(q, rh_g, rw_g, grid_h, grid_w, prec, mode=bias_mode)
    b4 = bhw.reshape(W, nh, N, grid_h + grid_w)
    kernel = functools.partial(_head_loop_kernel_qkv, grid_h=grid_h,
                               grid_w=grid_w, scale=scale)

    def spec_c(c):
        return pl.BlockSpec((1, 1, nh, N, hd), lambda w, c=c: (w, c, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=[spec_c(0), spec_c(1), spec_c(2),
                  pl.BlockSpec((1, nh, N, grid_h + grid_w),
                               lambda w: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nh, N, hd), lambda w: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, nh, N, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * W * nh * N * N * hd,
            bytes_accessed=4 * W * nh * N * hd * 2,
            transcendentals=W * nh * N * N),
        interpret=interpret,
    )(qkv, qkv, qkv, b4)


def flash_attention_relpos(q, k, v, rh, rw, *, grid_h: int, grid_w: int,
                           heads: int | None = None,
                           interpret: bool = False,
                           n_w: int | None = None,
                           valid_rows: int | None = None) -> jnp.ndarray:
    """Rel-pos attention over (G, N, hd) groups; N == grid_h * grid_w.

    rh: (grid_h, grid_h, hd) pre-gathered (rel_pos_h[idx]) or (2*gh-1, hd)
    raw table — both accepted; rw likewise. Query blocking: whole group per
    program for windows (N <= 256), one spatial row for the global grid.
    `heads` (optional): groups are windows*heads with head fastest — enables
    the window-per-program kernel for small N (ViT-H windowed layers:
    25 programs of 16 in-kernel head iterations instead of 400 programs).
    n_w / valid_rows (optional, head-fused path only): pad-query skip for
    the bottom window row — see _attention_head_fused."""
    N = q.shape[1]
    if rh.ndim == 2:
        rh_g, rw_g = _gathered_tables(rh, rw, grid_h, grid_w, q.dtype)
    else:
        rh_g = rh.astype(q.dtype)
        rw_g = rw.astype(q.dtype)
    if heads is not None and N <= 256 and q.shape[0] % heads == 0:
        return _attention_head_fused(q, k, v, rh_g, rw_g, grid_h=grid_h,
                                     grid_w=grid_w, heads=heads,
                                     bias_mode="expand",
                                     interpret=interpret,
                                     n_w=n_w, valid_rows=valid_rows)
    # Whole group per program for windows; for the big global grids 128-row
    # q-blocks measured fastest on v5e (1.92 ms vs 2.52 @64 / 2.09 @256 per
    # ViT-H global layer with the precomputed bias halves).
    block_q = N if N <= 256 else (128 if N % 128 == 0 else grid_w)
    return _attention_grouped(q, k, v, rh_g, rw_g, grid_h=grid_h,
                              grid_w=grid_w, block_q=block_q,
                              bias_mode="expand" if N <= 256 else "grid",
                              interpret=interpret)


def attention_reference(q, k, v, rh, rw, grid_h, grid_w):
    """Dense reference (the naive path) for testing the kernel.
    rh/rw: gathered (gh, gh, hd) form."""
    BH, N, hd = q.shape
    scale = hd ** -0.5
    qf = q.astype(jnp.float32)
    s = jnp.einsum("bqd,bkd->bqk", qf, k.astype(jnp.float32)) * scale
    qr = qf.reshape(BH, grid_h, grid_w, hd)
    bh = jnp.einsum("bhwc,hkc->bhwk", qr, rh.astype(jnp.float32))
    bw = jnp.einsum("bhwc,wkc->bhwk", qr, rw.astype(jnp.float32))
    bias = (bh[..., :, None] + bw[..., None, :]).reshape(BH, N, N)
    p = jax.nn.softmax(s + bias, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# LeViT-style windowed attention with a static per-head bias table (TinyViT)
# ---------------------------------------------------------------------------

def _levit_kernel(qkv_ref, bias_ref, o_ref, *, kd: int, scale: float):
    """One program = one window: all heads looped in-kernel.

    qkv_ref: (1, N, nh * 3*kd) — the qkv linear's output as-is, heads sliced
    by static channel offsets so no head transpose ever materialises.
    bias_ref: (nh, N, N) static LeViT table (resident across the whole
    grid). o_ref: (1, N, nh * kd). The (N, N) score/probability tiles live
    only in VMEM — the XLA lowering writes the (windows, nh, N, N) f32
    tensor through HBM twice per block."""
    nh = bias_ref.shape[0]
    prec = (jax.lax.Precision.HIGHEST if qkv_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    for h in range(nh):
        c0 = h * 3 * kd
        q = qkv_ref[0, :, c0:c0 + kd]
        k = qkv_ref[0, :, c0 + kd:c0 + 2 * kd]
        v = qkv_ref[0, :, c0 + 2 * kd:c0 + 3 * kd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec) * scale
        s = s + bias_ref[h].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        o_ref[0, :, h * kd:(h + 1) * kd] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def levit_window_attention(qkv: jnp.ndarray, bias: jnp.ndarray, *,
                           num_heads: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Biased window attention for TinyViT (LeViT construction).

    Measured on v5e (round 2): NOT a win — TinyViT @1024 encodes at 5.61 ms
    with this kernel vs 4.81 ms dense (XLA already handles the 49/196-token
    windows well; the kernel's serial head loop and unaligned 3*kd channel
    slices cost more than the HBM score-tensor round-trips it saves). Kept
    flag-gated (TinyViTConfig.use_flash_attention) with CPU parity tests;
    the Environment leaves TinyViT on the dense path.

    qkv:  (G, N, nh * 3*kd) — the qkv linear output per window.
    bias: (nh, N, N) gathered attention-bias table (static per window size).
    Returns (G, N, nh * kd)."""
    G, N, H = qkv.shape
    kd, rem = divmod(H, num_heads * 3)
    assert rem == 0, (
        f"qkv channel dim {H} is not num_heads({num_heads}) * 3 * kd — "
        f"the static per-head slices would read shifted q/k/v data")
    return pl.pallas_call(
        functools.partial(_levit_kernel, kd=kd, scale=kd ** -0.5),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, N, H), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, N, N), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, num_heads * kd), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, num_heads * kd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * num_heads * N * N * kd,
            bytes_accessed=2 * G * N * H,
            transcendentals=G * num_heads * N * N),
        interpret=interpret,
    )(qkv, bias)


# ---------------------------------------------------------------------------
# Windowed attention with BlockSpec-sliced windows (no physical partition)
# ---------------------------------------------------------------------------

def _window_strip_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                         ws: int, hd: int, scale: float):
    """One program = one (batch, window-row, head-group) strip.

    Blocks are strips sliced straight out of the padded NHWC tensors by the
    grid index map — legal on Mosaic because the block's last two dims are
    the FULL padded width and a 128-aligned (or full) channel group — so the
    6D partition/unpartition transposes of the host-side window path never
    touch HBM. Window columns and heads are iterated in-kernel (static
    slices of VMEM).
      q/k/v_ref: (1, ws, Wp, hblk);  rh/rw_ref: (ws*ws, ws, hd);  o: like q.
    """
    Wp = q_ref.shape[2]
    hblk = q_ref.shape[3]
    n = ws * ws
    rh = rh_ref[...].astype(jnp.float32)
    rw = rw_ref[...].astype(jnp.float32)
    sel_h = (jax.lax.broadcasted_iota(jnp.int32, (ws, n), 1) // ws
             == jax.lax.broadcasted_iota(jnp.int32, (ws, n), 0))
    sel_w = (jax.lax.broadcasted_iota(jnp.int32, (ws, n), 1) % ws
             == jax.lax.broadcasted_iota(jnp.int32, (ws, n), 0))
    sel_h = sel_h.astype(o_ref.dtype)
    sel_w = sel_w.astype(o_ref.dtype)

    for wx in range(Wp // ws):
        for hh in range(hblk // hd):
            c0 = hh * hd
            qn = q_ref[0, :, wx * ws:(wx + 1) * ws,
                       c0:c0 + hd].reshape(n, hd)
            k = k_ref[0, :, wx * ws:(wx + 1) * ws, c0:c0 + hd].reshape(n, hd)
            v = v_ref[0, :, wx * ws:(wx + 1) * ws, c0:c0 + hd].reshape(n, hd)
            prec = (jax.lax.Precision.HIGHEST if qn.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            s = jax.lax.dot_general(qn, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec) * scale
            q = qn.astype(jnp.float32)
            bh = jnp.sum(q[:, None, :] * rh, axis=-1)          # (n, ws)
            s = s + jax.lax.dot_general(bh.astype(qn.dtype), sel_h,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=prec)
            bw = jnp.sum(q[:, None, :] * rw, axis=-1)          # (n, ws)
            s = s + jax.lax.dot_general(bw.astype(qn.dtype), sel_w,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=prec)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            o_ref[0, :, wx * ws:(wx + 1) * ws, c0:c0 + hd] = (
                o.reshape(ws, ws, hd).astype(o_ref.dtype))


def _head_group(num_heads: int, hd: int) -> int:
    """Heads per channel-group block: the smallest group whose width is a
    multiple of 128 lanes (Mosaic block constraint), or all heads if no such
    group divides them (then the block is the full C dim, always legal)."""
    g = 1
    while g <= num_heads:
        if (g * hd) % 128 == 0 and num_heads % g == 0:
            return g
        g += 1
    return num_heads


@functools.partial(jax.jit, static_argnames=("ws", "num_heads", "interpret"))
def windowed_attention_fused(q, k, v, rh, rw, *, ws: int, num_heads: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Windowed rel-pos attention on padded NHWC tensors, windows sliced by
    BlockSpec strips (enable via SamViTConfig.fused_window_blocks).

    Measured on v5e (round 2): numerically validated on-chip (bf16 rel err
    ~1e-3 vs the dense path) but NOT a win — ViT-B @1024 encodes at 0.93x
    the dense-window path (34.3 vs 31.9 ms), and the ViT-H head-group strip
    (1,14,70,640) exceeds scoped VMEM when the window/head loop is unrolled.
    XLA's physical window partition is cheaper than it looks in profiles
    (overlapped with adjacent work), so the dense path stays the default;
    this kernel is kept for geometries where partition transposes dominate.

    q, k, v: (B, Hp, Wp, C) with Hp % ws == Wp % ws == 0 and C = nh * hd.
    rh, rw: (ws, ws, hd) gathered tables. Returns (B, Hp, Wp, C)."""
    B, Hp, Wp, C = q.shape
    hd = C // num_heads
    n = ws * ws
    hg = _head_group(num_heads, hd)
    hblk = hg * hd
    rh_e = jnp.repeat(rh, ws, axis=0).astype(q.dtype)   # (n, ws, hd)
    rw_e = jnp.tile(rw, (ws, 1, 1)).astype(q.dtype)     # (n, ws, hd)
    kernel = functools.partial(_window_strip_kernel, ws=ws, hd=hd,
                               scale=hd ** -0.5)
    grid = (B, Hp // ws, C // hblk)

    def spec():
        return pl.BlockSpec((1, ws, Wp, hblk),
                            lambda b, wy, hb: (b, wy, 0, hb),
                            memory_space=pltpu.VMEM)

    tspec = lambda gdim: pl.BlockSpec(  # noqa: E731
        (n, gdim, hd), lambda b, wy, hb: (0, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(), spec(), spec(), tspec(ws), tspec(ws)],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hp * Wp * C * n,
            bytes_accessed=8 * B * Hp * Wp * C,
            transcendentals=B * Hp * Wp * (C // hd) * n),
        interpret=interpret,
    )(q, k, v, rh_e, rw_e)
