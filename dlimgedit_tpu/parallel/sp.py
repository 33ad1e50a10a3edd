"""Sequence-parallel (sp) SAM ViT image encoding over a device mesh.

The third parallelism axis next to dp (parallel/batch.py) and tp
(parallel/mesh.py): shard the TOKEN dimension of one image across chips to
cut single-image encoder latency (BASELINE config 4 — ViT-H class — and
high-resolution canvases where the token count grows quadratically).

Why this is near-free on SAM ViTs (the TPU-native observation this module
is built on): ViTDet-style encoders interleave windowed and global
attention, and the window grid is STATIC — unlike Swin there is no shifted
window, so between two global-attention blocks consecutive windowed blocks
never mix tokens across windows (attention is intra-window; LayerNorm/MLP
are per-token). The residual stream can therefore live window-sharded over
the sp axis with ZERO communication for every windowed block (ViT-H: 28 of
32 blocks). Collectives appear only where information genuinely crosses the
whole image:

  * each global-attention block: one `all_gather` of the token stream over
    sp (ViT-H @1024: ~12.5 MB bf16 — ~0.1-0.3 ms on v5e ICI) to build the
    grid, the block computed with ROW-SHARDED queries (q/proj/MLP and the
    quadratic score/out matmuls all run on 1/sp of the rows; k/v are
    recomputed from the gathered grid instead of gathered — 2/3 of one qkv
    matmul ≈ 0.24 ms replicated beats moving 25 MB over ICI), then one row
    `all_gather` back;
  * the final unpartition before the neck convs.

Everything else — qkv/proj/MLP matmuls, LayerNorms, the windowed attention
itself — runs on 1/sp of the tokens per chip. XLA sees a plain shard_map
with explicit `all_gather`s riding ICI; no NCCL-style runtime exists
(SURVEY.md §2: the reference is a single-accelerator ORT session,
/root/reference/src/session.hpp — this axis has no counterpart there).

Exactness: bit-identical per-token math vs `sam_vit_apply`'s dense path.
Window padding follows the single-chip semantics exactly — pad tokens are
zeroed AFTER LayerNorm (matching `_vit_attn_branch`, which pads the normed
activations), so pad keys contribute `qkv` bias only, and pad-token
residual garbage is masked before every attention and cropped at the final
unpartition. Pinned by tests/test_sp.py parity vs `sam_vit_apply`.

Composition: sp shards activations, not weights — params stay replicated
(P()), so an (sp,) mesh composes with dp by vmapping images to meshes, and
with the tp head-sharding rules for memory-bound multi-tenant serving. The
global-attention blocks here gather the full sequence; at SAM geometries
(4096 tokens @1024) the gathered grid fits any single chip with orders of
magnitude to spare, so ring-attention-style kv rotation would add latency
for nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.common import HIGHEST, conv2d, gelu, layer_norm, linear
from ..models.vit_sam import (
    SamViTConfig,
    _layer_norm,
    _vit_attention,
    _vit_block_carry,
    gather_rel_pos,
)

__all__ = ["make_sp_mesh", "sam_vit_apply_sp", "encode_image_sp"]


def make_sp_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D ('sp',) mesh over `n_devices` (CPU fallback like make_mesh).

    Fails loudly when fewer devices are visible than requested (matching
    make_mesh's reshape behaviour) — a silently smaller mesh would let
    parity gates "pass" while exercising almost no parallelism."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            devices = jax.devices("cpu")
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_sp_mesh({n}): only {len(devices)} devices visible "
            "(set --xla_force_host_platform_device_count for CPU meshes)")
    return Mesh(np.asarray(devices[:n]), ("sp",))


def _geometry(cfg: SamViTConfig, B: int, sp: int):
    """Static window-grid geometry for the sharded layout.

    window_size=0 (every block global in the dense path) degenerates to
    one grid-sized window per image: "windowed" blocks then compute
    full-grid attention — exactly the dense path's global branch — and
    the layout stays well-defined (no parallel win for the non-indexed
    blocks, but correct instead of a ZeroDivisionError)."""
    G, ws = cfg.grid, cfg.window_size or cfg.grid
    pad = (ws - G % ws) % ws
    pG = G + pad
    n_side = pG // ws
    n_win = B * n_side * n_side
    n_pad = (-n_win) % sp  # dummy windows so sp divides the window count
    return G, ws, pad, pG, n_side, n_win, n_win + n_pad


def _partition(x: jnp.ndarray, ws: int, pad: int, n_extra: int) -> jnp.ndarray:
    """(B, G, G, C) grid -> (n_win + n_extra, ws, ws, C) zero-padded windows."""
    B, G, _, C = x.shape
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
    n = (G + pad) // ws
    x = x.reshape(B, n, ws, n, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B * n * n, ws, ws, C)
    if n_extra:
        x = jnp.pad(x, ((0, n_extra), (0, 0), (0, 0), (0, 0)))
    return x


def _unpartition(wins: jnp.ndarray, B: int, G: int, ws: int, pad: int
                 ) -> jnp.ndarray:
    """Inverse of _partition (drops dummy windows and grid padding)."""
    n = (G + pad) // ws
    C = wins.shape[-1]
    x = wins[: B * n * n].reshape(B, n, n, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, G + pad, G + pad, C)[:, :G, :G, :]


def _token_mask(cfg: SamViTConfig, B: int, sp: int, dtype) -> jnp.ndarray:
    """(n_win_padded, ws, ws, 1) validity mask: 1 where the token maps to a
    real grid position, 0 at grid padding and dummy windows."""
    G, ws, pad, _, _, _, n_tot = _geometry(cfg, B, sp)
    ones = jnp.ones((B, G, G, 1), dtype)
    m = _partition(ones, ws, pad, n_tot - B * ((G + pad) // ws) ** 2)
    return m


def sam_vit_apply_sp(params, x: jnp.ndarray, cfg: SamViTConfig, mesh: Mesh,
                     axis: str = "sp") -> jnp.ndarray:
    """Sequence-parallel `sam_vit_apply`: same signature + a mesh.

    x: (B, S, S, 3) normalised pixels -> (B, S/16, S/16, neck_dim),
    numerically identical to the single-device path (tests/test_sp.py).
    Call under `jax.jit` with `mesh` active (encode_image_sp does both).
    """
    sp = mesh.shape[axis]
    B = x.shape[0]
    G, ws, pad, _, _, n_win, n_tot = _geometry(cfg, B, sp)
    n_loc = n_tot // sp
    n_extra = n_tot - n_win  # dummy windows appended so sp divides n_tot

    # Patch embed + abs pos on the replicated grid: 1 matmul over G*G tokens
    # (~2% of encoder FLOPs) — not worth a reshard before the window split.
    from ..models.vit_sam import _patch_embed

    x = _patch_embed(params["patch_embed"], x, cfg.patch_size)
    if cfg.use_abs_pos and "pos_embed" in params:
        x = x + params["pos_embed"].astype(x.dtype)

    wins0 = _partition(x, ws, pad, n_extra)
    mask0 = _token_mask(cfg, B, sp, x.dtype)

    def block_windowed(bp, win, mask):
        # Pad semantics == _vit_attn_branch: zero AFTER LN, so pad keys see
        # exactly the qkv bias; residual garbage at pads is masked here and
        # cropped at the end. LN goes through _layer_norm so the TPU
        # fused-kernel dispatch (bit-matching) applies here too; the
        # mask multiply between LN and attention is why this body can't
        # use _vit_block_carry's fused add+LN carry form directly.
        y1 = _layer_norm(bp["norm1"], win, cfg) * mask
        a = _vit_attention(bp, y1, cfg.num_heads, cfg.use_rel_pos,
                           use_flash=cfg.use_flash_attention,
                           flash_interpret=cfg.flash_interpret)
        win = win + a
        y2 = _layer_norm(bp["norm2"], win, cfg)
        return win + linear(bp["mlp"]["lin2"],
                            gelu(linear(bp["mlp"]["lin1"], y2)))

    def block_global_replicated(bp, grid):
        # Fallback for the Pallas-flash and quantized-qkv paths (the
        # row-sharded form below slices plain f32/bf16 qkv weights and
        # computes bias with the dense decomposition): every device runs
        # the full global block on the gathered grid — the ONE canonical
        # block body (_vit_block_carry, window=0), so fused-LN and any
        # future block changes apply here automatically. ViT-H: 4 of 32
        # blocks duplicated, the other 28 still scale 1/sp.
        h, m = _vit_block_carry(bp, grid, None, cfg, 0)
        return h + m

    def block_global_rows(bp, grid, idx):
        # Row-sharded global block: queries, proj, MLP and the quadratic
        # score/out matmuls run on this device's row band only; k/v are
        # recomputed from the full (unpadded) grid, so no key masking is
        # ever needed and pad-query rows are cropped by the final slice.
        # Bit-exact vs the dense path: the q|kv weight split leaves every
        # output column's contraction untouched, and the rel-pos bias uses
        # the same einsum decomposition on the sliced row band.
        B_, G_, _, C = grid.shape
        nh = cfg.num_heads
        hd = C // nh
        rl = -(-G_ // sp)  # ceil: row band per device
        Gp = rl * sp
        pad_rows = ((0, 0), (0, Gp - G_), (0, 0), (0, 0))
        y1 = _layer_norm(bp["norm1"], grid, cfg)
        y1l = jax.lax.dynamic_slice_in_dim(jnp.pad(y1, pad_rows),
                                           idx * rl, rl, 1)
        xl = jax.lax.dynamic_slice_in_dim(jnp.pad(grid, pad_rows),
                                          idx * rl, rl, 1)
        w, b = bp["qkv"]["w"], bp["qkv"]["b"]
        q = jnp.dot(y1l.reshape(B_, rl * G_, C), w[:, :C].astype(y1.dtype),
                    preferred_element_type=jnp.float32,
                    precision=HIGHEST).astype(y1.dtype) + b[:C].astype(y1.dtype)
        kv = jnp.dot(y1.reshape(B_, G_ * G_, C), w[:, C:].astype(y1.dtype),
                     preferred_element_type=jnp.float32,
                     precision=HIGHEST).astype(y1.dtype) + b[C:].astype(y1.dtype)
        q = q.reshape(B_, rl * G_, nh, hd).transpose(0, 2, 1, 3)
        kv = kv.reshape(B_, G_ * G_, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        scores = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                            preferred_element_type=jnp.float32,
                            precision=HIGHEST) * (hd ** -0.5)
        if cfg.use_rel_pos:
            rh = gather_rel_pos(bp["rel_pos_h"], G_)
            rw = gather_rel_pos(bp["rel_pos_w"], G_)
            rh_loc = jax.lax.dynamic_slice_in_dim(
                jnp.pad(rh, ((0, Gp - G_), (0, 0), (0, 0))), idx * rl, rl, 0)
            qr = q.reshape(B_, nh, rl, G_, hd)
            bias_h = jnp.einsum("bnrwc,rkc->bnrwk", qr,
                                rh_loc.astype(q.dtype),
                                preferred_element_type=jnp.float32,
                                precision=HIGHEST)
            bias_w = jnp.einsum("bnrwc,wlc->bnrwl", qr, rw.astype(q.dtype),
                                preferred_element_type=jnp.float32,
                                precision=HIGHEST)
            scores = scores + (bias_h[..., :, None] +
                               bias_w[..., None, :]).reshape(
                                   B_, nh, rl * G_, G_ * G_)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", probs, v,
                         preferred_element_type=jnp.float32,
                         precision=HIGHEST).astype(v.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, rl, G_, C)
        h = xl + linear(bp["proj"], out)
        y2 = _layer_norm(bp["norm2"], h, cfg)
        rows = h + linear(bp["mlp"]["lin2"],
                          gelu(linear(bp["mlp"]["lin1"], y2)))
        full = jax.lax.all_gather(rows, axis, axis=1, tiled=True)
        return full[:, :G_]

    def body(prm, win, mask):
        # win/mask: (n_loc, ws, ws, C/1) — this shard's windows.
        idx = jax.lax.axis_index(axis)
        for i, bp in enumerate(prm["blocks"]):
            if i in cfg.global_attn_indexes:
                full = jax.lax.all_gather(win, axis, axis=0, tiled=True)
                grid = _unpartition(full, B, G, ws, pad)
                if cfg.use_flash_attention or "w" not in bp["qkv"]:
                    grid = block_global_replicated(bp, grid)
                else:
                    grid = block_global_rows(bp, grid, idx)
                full = _partition(grid, ws, pad, n_extra)
                win = jax.lax.dynamic_slice_in_dim(full, idx * n_loc, n_loc, 0)
            else:
                win = block_windowed(bp, win, mask)
        full = jax.lax.all_gather(win, axis, axis=0, tiled=True)
        return _unpartition(full, B, G, ws, pad)

    grid = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),  # replicated: every shard gathered the full stream
        check_vma=False,
    )(params, wins0, mask0)

    neck = params["neck"]
    grid = conv2d(grid, neck["conv1"]["w"].astype(grid.dtype))
    grid = layer_norm(neck["ln1"], grid, eps=1e-6)
    grid = conv2d(grid, neck["conv2"]["w"].astype(grid.dtype), padding=1)
    return layer_norm(neck["ln2"], grid, eps=1e-6)


_JIT_CACHE: dict = {}


def encode_image_sp(params, cfg, x: jnp.ndarray, mesh: Mesh | None = None):
    """SAM-level sequence-parallel encode (ViT-B/L/H variants).

    params/cfg: full SAM param tree + SamConfig (cfg.encoder_vit required —
    TinyViT's conv stages have no token axis to shard; use dp there).
    x: (B, S, S, 3) normalised pixels -> (B, S/16, S/16, 256), replicated.
    """
    if cfg.encoder_vit is None:
        raise ValueError("encode_image_sp needs a ViT encoder variant "
                         "(vit_b/vit_l/vit_h); MobileSAM scales via dp")
    mesh = mesh or make_sp_mesh()
    key = ("encode_sp", cfg, mesh,
           jax.tree_util.tree_structure(params))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        repl = NamedSharding(mesh, P())
        fn = jax.jit(
            lambda p, im: sam_vit_apply_sp(p, im, cfg.encoder_vit, mesh),
            in_shardings=(jax.tree_util.tree_map(lambda _: repl, params["encoder"]),
                          repl),
            out_shardings=repl,
        )
        _JIT_CACHE[key] = fn
    return fn(params["encoder"], x)
