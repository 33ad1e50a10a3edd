#!/usr/bin/env python
"""On-chip microbenchmarks behind every number in BENCH_NOTES.md.

Methodology (see BENCH_NOTES.md "Metric definition"): per-iteration device
time is the two-point slope (T(2N) - T(N)) / N over chained fori_loop
programs — one host sync per *program*, so every fixed cost (dispatch, the
WAN relay's ~28 ms sync round-trip, fetch) cancels. The naive chained/N
form silently adds sync_floor/N to every number.

Run from the repo root (PYTHONPATH must stay unset — it breaks the axon
TPU plugin registration; see CLAUDE.md):

    python tools/tpu_microbench.py encoders          # all model families
    python tools/tpu_microbench.py batch             # batch/throughput scaling
    python tools/tpu_microbench.py attention         # Pallas kernel vs dense
    python tools/tpu_microbench.py tinyvit-stages    # per-stage breakdown
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

# Repo root on sys.path without PYTHONPATH (which breaks the axon plugin).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DLIMG_COMPILATION_CACHE",
                                 os.path.expanduser("~/.cache/dlimgedit_tpu/xla")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

N_CHAIN = 8


def slope_ms(fn, args, reps=4, n_chain=None):
    """True per-iteration device time of fn(*args, eps) via 2-point slope.

    Sub-0.15 ms ops are re-measured with an 8x deeper chain: at N=8 the
    slope delta of a ~30 us op (~0.25 ms) sits inside the tunnel's run-to-
    run noise and produced garbage (the round-2 ledger read LayerNorm at
    0.129 ms when 64-deep chains show 0.028 ms at 746 GB/s)."""
    def run(nch):
        def make(n):
            def chained(*a):
                def body(i, acc):
                    e = fn(*a, (acc * 1e-20))
                    return jnp.sum(e.astype(jnp.float32))
                return lax.fori_loop(0, n, body, jnp.float32(0))
            return jax.jit(chained)

        f1, f2 = make(nch), make(2 * nch)
        jax.device_get(f1(*args))
        jax.device_get(f2(*args))

        def best(f):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.device_get(f(*args))
                ts.append((time.perf_counter() - t0) * 1e3)
            return min(ts)

        return max(best(f2) - best(f1), 0.0) / nch

    if n_chain is not None:
        return run(n_chain)
    ms = run(N_CHAIN)
    if ms < 0.15:
        ms = run(8 * N_CHAIN)
    return ms


def _bf16(tree):
    from dlimgedit_tpu.models.common import cast_tree

    return cast_tree(tree, jnp.bfloat16)


def _img(size=1024, key=1):
    return (jax.random.normal(jax.random.PRNGKey(key), (1, size, size, 3))
            * 0.5).astype(jnp.bfloat16)


def cmd_encoders(dev, quant="none"):
    from dlimgedit_tpu.models import birefnet, sam as sam_lib, tinyvit, vit_sam

    def _q(params):
        """Environment-exact quantisation order: int8 scales from the f32
        weights, THEN the bf16 cast (SamModelBundle, environment.py)."""
        if quant == "none":
            return _bf16(params)
        from dlimgedit_tpu.ops.quant import quantize_encoder

        return _bf16(quantize_encoder(params, act_int8=(quant == "w8a8")))

    x = jax.device_put(_img(), dev)
    tag = "" if quant == "none" else f" [{quant}]"

    cfg = tinyvit.TinyViTConfig(img_size=1024)
    p = jax.device_put(_q(tinyvit.init_tiny_vit(jax.random.PRNGKey(0),
                                                cfg)), dev)
    ms = slope_ms(lambda p, xx, e: tinyvit.tiny_vit_apply(
        p, xx * (1 + e).astype(xx.dtype), cfg), (p, x))
    print(f"tinyvit (MobileSAM) encode @1024{tag}: {ms:7.2f} ms", flush=True)

    for variant in ("vit_b", "vit_l", "vit_h"):
        vcfg = dataclasses.replace(vit_sam.VIT_PRESETS[variant](1024),
                                   use_flash_attention=True)
        p = jax.device_put(_q(vit_sam.init_sam_vit(
            jax.random.PRNGKey(0), vcfg)), dev)
        ms = slope_ms(lambda p, xx, e, c=vcfg: vit_sam.sam_vit_apply(
            p, xx * (1 + e).astype(xx.dtype), c), (p, x))
        print(f"{variant} encode @1024{tag}: {ms:7.2f} ms", flush=True)

    bcfg = birefnet.BiRefNetConfig()
    p = jax.device_put(_bf16(birefnet.init_birefnet(jax.random.PRNGKey(0),
                                                    bcfg)), dev)
    ms = slope_ms(lambda p, xx, e: birefnet.birefnet_apply(
        p, xx * (1 + e).astype(xx.dtype), bcfg), (p, x))
    print(f"birefnet full graph @1024: {ms:7.2f} ms", flush=True)

    dcfg = sam_lib.make_config("mobile_sam")
    p = jax.device_put(_bf16(sam_lib.init_sam(jax.random.PRNGKey(0), dcfg)),
                       dev)
    emb = jax.device_put((jax.random.normal(
        jax.random.PRNGKey(2), (1, 64, 64, 256)) * 0.1
        ).astype(jnp.float32), dev)
    pts = jax.device_put(np.array([[[512.0, 512.0], [0.0, 0.0]]], np.float32),
                         dev)
    lbl = jax.device_put(np.array([[1.0, -1.0]], np.float32), dev)
    ms = slope_ms(lambda p, e_, pt, lb, eps: sam_lib.decode_masks(
        p, dcfg, e_ + eps.astype(e_.dtype), pt, lb, multimask=False)[0],
        (p, emb, pts, lbl))
    print(f"mask decode (single prompt): {ms:7.3f} ms", flush=True)


def cmd_amg(dev, variant="mobile_sam", grid=32, max_masks=64):
    """Automatic mask generation: device program time + e2e wall per image.

    The whole segment-everything pipeline (grid^2 x 3 candidate decodes,
    filters, exact greedy NMS, top-K re-decode + upsample + pack) is one
    XLA program (runtime/amg.py); this prices it at real geometry."""
    import dlimgedit_tpu as dl
    from dlimgedit_tpu.ops.preprocess import pick_bucket
    from dlimgedit_tpu.runtime.amg import _build_amg_fn, _chunk_size

    backend = dl.Backend.tpu if dev.platform != "cpu" else dl.Backend.cpu
    env = dl.Environment(dl.Options(
        backend=backend, allow_random_weights=True,
        compute_dtype="bfloat16", sam_variant=variant))
    rng = np.random.default_rng(0)
    img = dl.Image(dl.Extent(1024, 768), dl.Channels.rgba,
                   rng.integers(0, 256, (768, 1024, 4), dtype=np.uint8))
    seg = dl.Segmentation.process(img, env)

    # e2e wall (dispatch + device + single packed fetch), warm.
    seg.generate_masks(grid=grid, max_masks=max_masks, iou_thresh=0.0,
                       stability_thresh=0.0)
    walls = []
    for _ in range(4):
        t0 = time.perf_counter()
        masks = seg.generate_masks(grid=grid, max_masks=max_masks,
                                   iou_thresh=0.0, stability_thresh=0.0)
        walls.append((time.perf_counter() - t0) * 1e3)
    print(f"amg {variant} grid={grid} K={max_masks} e2e wall: "
          f"{min(walls):7.1f} ms ({len(masks)} masks)", flush=True)

    # Device-only program time via the two-point slope.
    from dlimgedit_tpu.runtime.amg import _prenms_pool

    bundle = env.sam_model(variant)
    bucket = pick_bucket(seg.extent)
    G = grid * grid
    prenms = _prenms_pool(G, max_masks)
    fn = _build_amg_fn(bundle, bucket, grid, max_masks, prenms,
                       _chunk_size(G))
    sizes = env.sizes_on_device((seg.extent.height, seg.extent.width,
                                 seg._crop[0], seg._crop[1]))
    thr = jax.device_put(
        np.asarray([0.0, 0.0, 0.7, 0.0, 1.0, 0.0], np.float32),
        env.put_target)
    ms = slope_ms(lambda p, e_, s, t, eps: fn(
        p, e_ + eps.astype(e_.dtype), s, t)[0],
        (bundle.params, seg.embedding, sizes, thr), n_chain=2)
    print(f"amg {variant} grid={grid} K={max_masks} device program: "
          f"{ms:7.1f} ms", flush=True)

    # Pass-A vs pass-B numeric drift (advisor r4): the chunked-lax.map and
    # flat-vmap decode programs may fuse differently in bf16; measure the
    # max logit/IoU delta over every candidate at this geometry.
    from dlimgedit_tpu.models import sam as sam_lib
    from dlimgedit_tpu.ops.amg import point_grid

    cfg = bundle.cfg

    def decode3(pt):
        pc = jnp.stack([pt, jnp.zeros_like(pt)], axis=0)[None]
        pl = jnp.array([[1.0, -1.0]], jnp.float32)
        m, iou = sam_lib.decode_masks(bundle.params, cfg, seg.embedding,
                                      pc, pl, multimask=True)
        return m[0, 1:4], iou[0, 1:4]

    chunk = _chunk_size(G)
    # Subset of points (2 chunks): materialising ALL 3G low-res masks twice
    # is exactly the 805 MB pass-A avoids (runtime/amg.py docstring) and
    # OOMs the chip; program-shape drift shows on any chunk count >= 2.
    n_sub = min(G, 2 * chunk)

    @jax.jit
    def drift():
        pts = point_grid(grid, jnp.float32(seg._crop[1]),
                         jnp.float32(seg._crop[0]))[:n_sub]
        ma, ia = lax.map(jax.vmap(decode3), pts.reshape(-1, chunk, 2))
        mb, ib = jax.vmap(decode3)(pts)
        return (jnp.max(jnp.abs(ma.reshape(mb.shape) - mb)),
                jnp.max(jnp.abs(ia.reshape(ib.shape) - ib)))

    dm, di = jax.device_get(drift())
    print(f"amg pass-A/pass-B drift: max|logit| {float(dm):.3e}, "
          f"max|iou| {float(di):.3e}", flush=True)


def cmd_batch(dev, quant="none", variant="mobile_sam"):
    """Batched encode/decode throughput; --quant w8|w8a8 quantises the
    encoder exactly the way the Environment does (scales from f32 weights,
    THEN the bf16 cast; cast_tree leaves w_q/w_scale untouched) — the
    round-4 A/B for int8 serving at batch > 1 (round-2 data: no win at
    batch 1; the s8 x s8 MXU rate should start paying once the matmuls are
    batch-bound)."""
    import dataclasses

    from dlimgedit_tpu.models import sam as sam_lib
    from dlimgedit_tpu.models.common import cast_tree
    from dlimgedit_tpu.parallel.batch import decode_prompt_batch

    cfg = sam_lib.make_config(variant)
    if cfg.encoder_vit is not None:
        # The PRODUCTION accelerator path (Environment._load_sam flips this
        # on): without it the A/B times dense attention + stock LN, ~3x off
        # the serving numbers the verdict is drawn against.
        cfg = dataclasses.replace(cfg, encoder_vit=dataclasses.replace(
            cfg.encoder_vit, use_flash_attention=True))
    raw = dict(sam_lib.init_sam(jax.random.PRNGKey(0), cfg))
    if quant != "none":
        from dlimgedit_tpu.ops.quant import quantize_encoder

        raw["encoder"] = quantize_encoder(raw["encoder"],
                                          act_int8=(quant == "w8a8"))
        print(f"encoder quantised: {quant}", flush=True)
    # Environment-exact dtype policy: bf16 ENCODER, f32 prompt-encoder /
    # decoder (SamModelBundle casts only params['encoder']).
    raw["encoder"] = cast_tree(raw["encoder"], jnp.bfloat16)
    p = jax.device_put(raw, dev)
    for B in (1, 2, 4, 8):
        x = jax.device_put((jax.random.normal(
            jax.random.PRNGKey(1), (B, 1024, 1024, 3)) * 0.5
            ).astype(jnp.bfloat16), dev)
        ms = slope_ms(lambda pp, xx, e: sam_lib.encode_image(
            pp, cfg, xx * (1 + e).astype(xx.dtype)), (p, x))
        print(f"encode B={B}: {ms:8.2f} ms ({B / ms * 1e3:6.1f} img/s)",
              flush=True)
    emb = jax.device_put((jax.random.normal(
        jax.random.PRNGKey(2), (1, 64, 64, 256)) * 0.1
        ).astype(jnp.float32), dev)
    for P in (1, 8, 32):
        pts = jax.device_put(np.random.default_rng(0).uniform(
            0, 1024, (P, 2, 2)).astype(np.float32), dev)
        lbl = jax.device_put(np.tile(np.array([[1.0, -1.0]], np.float32),
                                     (P, 1)), dev)
        ms = slope_ms(lambda pp, e_, pt, lb, eps: decode_prompt_batch(
            pp, cfg, e_ + eps.astype(e_.dtype), pt, lb, multimask=False)[0],
            (p, emb, pts, lbl))
        print(f"decode P={P:3d}: {ms:8.3f} ms ({P / ms * 1e3:7.1f} masks/s)",
              flush=True)


def cmd_attention(dev):
    from dlimgedit_tpu.ops.flash_attention import (attention_reference,
                                                   flash_attention_relpos)

    G, gh, gw, hd = 16, 64, 64, 80  # ViT-H global geometry
    N = gh * gw
    rng = np.random.default_rng(0)
    mk = lambda: jax.device_put(  # noqa: E731
        (rng.standard_normal((G, N, hd)) * 0.1).astype(jnp.bfloat16), dev)
    q, k, v = mk(), mk(), mk()
    rh = jnp.asarray((rng.standard_normal((2 * gh - 1, hd)) * 0.1
                      ).astype(np.float32))
    ms = slope_ms(lambda q, k, v, e: flash_attention_relpos(
        q * (1 + e).astype(q.dtype), k, v, rh.astype(jnp.bfloat16),
        rh.astype(jnp.bfloat16), grid_h=gh, grid_w=gw), (q, k, v))
    print(f"pallas rel-pos attention (ViT-H global layer): {ms:6.2f} ms",
          flush=True)
    rh_g = jnp.take(rh, jnp.asarray(
        np.arange(gh)[:, None] - np.arange(gh)[None, :] + gh - 1), axis=0)
    ms = slope_ms(lambda q, k, v, e: attention_reference(
        q * (1 + e).astype(q.dtype), k, v, rh_g.astype(jnp.bfloat16),
        rh_g.astype(jnp.bfloat16), gh, gw), (q, k, v))
    print(f"dense XLA attention (same layer):              {ms:6.2f} ms",
          flush=True)


def cmd_tinyvit_stages(dev):
    from dlimgedit_tpu.models import tinyvit
    from dlimgedit_tpu.models.common import conv2d, conv_bn, gelu, layer_norm

    cfg = tinyvit.TinyViTConfig(img_size=1024)
    p = jax.device_put(_bf16(tinyvit.init_tiny_vit(jax.random.PRNGKey(0),
                                                   cfg)), dev)
    x = jax.device_put(_img(), dev)

    def prefix(n_stages, with_neck):
        def f(pp, xx):
            y = tinyvit._stem(pp["patch_embed"], xx)
            for i in range(n_stages):
                stage = pp["stages"][i]
                if i == 0:
                    for bp in stage["blocks"]:
                        y = tinyvit._mbconv(bp, y)
                else:
                    for bp in stage["blocks"]:
                        y = tinyvit._tiny_vit_block(bp, y, cfg.num_heads[i],
                                                    cfg.window_sizes[i], cfg)
                if "downsample" in stage:
                    stride = 1 if cfg.embed_dims[i + 1] in (320, 448, 576) else 2
                    y = tinyvit._patch_merging(stage["downsample"], y, stride)
            if with_neck:
                neck = pp["neck"]
                y = conv2d(y, neck["conv1"]["w"].astype(y.dtype))
                y = layer_norm(neck["ln1"], y, eps=1e-6)
                y = conv2d(y, neck["conv2"]["w"].astype(y.dtype), padding=1)
                y = layer_norm(neck["ln2"], y, eps=1e-6)
            return y
        return f

    prev = 0.0
    for name, f in [("patch_embed", prefix(0, False)),
                    ("+stage0", prefix(1, False)),
                    ("+stage1", prefix(2, False)),
                    ("+stage2", prefix(3, False)),
                    ("+stage3", prefix(4, False)),
                    ("+neck", prefix(4, True))]:
        ms = slope_ms(lambda pp, xx, e, f=f: f(
            pp, xx * (1 + e).astype(xx.dtype)), (p, x))
        print(f"{name:12s} cum {ms:7.3f} ms  delta {ms - prev:7.3f} ms",
              flush=True)
        prev = ms


def cmd_birefnet(dev, only_res=0, exact_only=False):
    """BiRefNet full graph at both runtime resolutions (general @1024,
    high_res @2048 — segmentation.cpp:222-225 escalation), exact vs the
    opt-in int8 deform-gather path (Options.birefnet_int8_deform).
    only_res (--res) restricts to one resolution and --exact skips the
    int8 leg — used for focused A/Bs like the DLIMG_DEFORM_COL_TILES
    2-D banding experiment."""
    import dataclasses as dc

    from dlimgedit_tpu.models import birefnet

    for res in (1024, 2048):
        if only_res and res != only_res:
            continue
        x = jax.device_put(_img(res), dev)
        for int8 in ((False,) if exact_only else (False, True)):
            cfg = dc.replace(birefnet.BiRefNetConfig(img_size=res),
                             deform_int8_gather=int8)
            p = jax.device_put(_bf16(birefnet.init_birefnet(
                jax.random.PRNGKey(0), cfg)), dev)
            ms = slope_ms(lambda p, xx, e, c=cfg: birefnet.birefnet_apply(
                p, xx * (1 + e).astype(xx.dtype), c), (p, x))
            tag = "int8 deform" if int8 else "exact deform"
            print(f"birefnet @{res} ({tag}): {ms:8.2f} ms", flush=True)


def birefnet_prefix(cfg, k):
    """Cumulative BiRefNet prefix (stage k of 7) for the per-stage ledger.

    Mirrors birefnet_apply's structure the way cmd_vit_prefix mirrors the
    ViT block loop; tests/test_birefnet.py pins prefix(7) == the full
    model so the mirror cannot drift silently."""
    from dlimgedit_tpu.models import birefnet
    from dlimgedit_tpu.models.swin import swin_apply

    def f(params, x):
        S = x.shape[1]
        feats = swin_apply(params["backbone"], x, cfg.swin)
        if k == 1:
            return feats[3]
        if cfg.mul_scl_ipt == "cat":
            x_half = birefnet.resize_align_corners(x, (S // 2, S // 2))
            feats_half = swin_apply(params["backbone"], x_half, cfg.swin)
            feats = [jnp.concatenate(
                [f_, birefnet.resize_align_corners(fh, f_.shape[1:3])],
                axis=-1) for f_, fh in zip(feats, feats_half)]
        x1, x2, x3, x4 = feats
        if k == 2:
            return x4
        if cfg.cxt_num:
            ctx = [birefnet.resize_align_corners(f_, x4.shape[1:3])
                   for f_ in (x1, x2, x3)]
            x4 = jnp.concatenate(ctx[-cfg.cxt_num:] + [x4], axis=-1)
        x4 = birefnet._apply_dec_blk(params["squeeze"], x4, cfg)
        if k == 3:
            return x4
        dec = params["decoder"]
        pat = birefnet._get_patches(x, x4.shape[1])
        x4 = jnp.concatenate(
            [x4, birefnet._apply_simple_convs(dec["ipt_blk5"], pat)], -1)
        p4 = birefnet._apply_dec_blk(dec["dec4"], x4, cfg)
        p4 = birefnet._gdt_gate(dec, 4, p4)
        _p4 = birefnet.resize_align_corners(p4, x3.shape[1:3])
        _p3 = _p4 + birefnet._conv(dec["lat4"], x3)
        if k == 4:
            return _p3
        pat = birefnet._get_patches(x, x3.shape[1])
        _p3 = jnp.concatenate(
            [_p3, birefnet._apply_simple_convs(dec["ipt_blk4"], pat)], -1)
        p3 = birefnet._apply_dec_blk(dec["dec3"], _p3, cfg)
        p3 = birefnet._gdt_gate(dec, 3, p3)
        _p3u = birefnet.resize_align_corners(p3, x2.shape[1:3])
        _p2 = _p3u + birefnet._conv(dec["lat3"], x2)
        if k == 5:
            return _p2
        pat = birefnet._get_patches(x, x2.shape[1])
        _p2 = jnp.concatenate(
            [_p2, birefnet._apply_simple_convs(dec["ipt_blk3"], pat)], -1)
        p2 = birefnet._apply_dec_blk(dec["dec2"], _p2, cfg)
        p2 = birefnet._gdt_gate(dec, 2, p2)
        _p2u = birefnet.resize_align_corners(p2, x1.shape[1:3])
        _p1 = _p2u + birefnet._conv(dec["lat2"], x1)
        if k == 6:
            return _p1
        pat = birefnet._get_patches(x, x1.shape[1])
        _p1 = jnp.concatenate(
            [_p1, birefnet._apply_simple_convs(dec["ipt_blk2"], pat)], -1)
        _p1 = birefnet._apply_dec_blk(dec["dec1"], _p1, cfg)
        return birefnet._head_fold(dec, _p1, x, (S, S))
    return f


def _stage_ledger(names, make_prefix, params, x):
    """Cumulative-prefix ledger printer shared by the birefnet stage and
    level-1 sub-stage commands: per-stage delta ms + FLOP/bytes floors from
    XLA's compiled cost analysis (prices the graph actually executed)."""
    def stage_cost(k):
        f = make_prefix(k)
        try:
            ca = jax.jit(f).lower(params, x).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return (float(ca.get("flops", 0.0)) / 1e9,
                    float(ca.get("bytes accessed", 0.0)) / 1e6)
        except Exception:
            return 0.0, 0.0

    prev_ms, prev_gf, prev_mb = 0.0, 0.0, 0.0
    for k in range(1, len(names) + 1):
        f = make_prefix(k)
        ms = slope_ms(lambda pp, xx, e, f=f: f(
            pp, xx * (1 + e).astype(xx.dtype)), (params, x))
        gf, mb = stage_cost(k)
        d_ms, d_gf = ms - prev_ms, gf - prev_gf
        d_mb = mb - prev_mb
        # The stage floor is whichever of MXU flops / HBM traffic
        # binds for the compiled (post-fusion) graph.
        floor = max(d_gf / PEAK_TFLOPS_BF16, d_mb / PEAK_GBPS_HBM)
        mfu = 100.0 * (d_gf / d_ms) / PEAK_TFLOPS_BF16 if d_ms > 0 else 0
        bwu = 100.0 * (d_mb / d_ms) / PEAK_GBPS_HBM if d_ms > 0 else 0
        print(f"{names[k-1]:30s} cum {ms:8.2f} ms  delta {d_ms:7.2f} ms"
              f"  {d_gf:8.1f} GF {mfu:5.1f}% MFU"
              f"  {d_mb:8.0f} MB {bwu:5.1f}% BW  floor {floor:6.2f} ms",
              flush=True)
        prev_ms, prev_gf, prev_mb = ms, gf, mb


def cmd_birefnet_stages(dev):
    """BiRefNet per-stage ledger (VERDICT round-3 #4): cumulative prefix
    timing at BOTH runtime resolutions, with per-stage deltas and the
    XLA-estimated FLOP floor per delta (compiled cost analysis, so the
    floor prices the graph actually executed)."""
    from dlimgedit_tpu.models import birefnet

    names = ["swin full-res", "+swin half-res cat", "+cxt+squeeze",
             "+level4 (ipt5/dec4/gdt/lat4)", "+level3", "+level2",
             "+level1+head"]

    for res in (1024, 2048):
        x = jax.device_put(_img(res), dev)
        cfg = birefnet.BiRefNetConfig(img_size=res)
        p = jax.device_put(_bf16(birefnet.init_birefnet(
            jax.random.PRNGKey(0), cfg)), dev)
        print(f"--- birefnet @{res} ---", flush=True)
        _stage_ledger(names, lambda k, c=cfg: birefnet_prefix(c, k), p, x)


def birefnet_l1_prefix(cfg, j):
    """Cumulative sub-prefix WITHIN BiRefNet's level1+head stage (the
    dominant ledger row: 48 of 77 ms @1024).  j indexes:
      1  levels 2..6 baseline (== birefnet_prefix(cfg, 6); row exists so
         every later delta is a pure level-1 sub-stage cost)
      2  ipt_blk2 cat + dec1 conv_in
      3  +aspp1 (1x1 deform)
      4..3+K  +deform branch per cfg.aspp_kernel_sizes entry
      4+K  +gap+proj (ASPP complete)
      5+K  +conv_out (dec1 done)
      6+K  +head_a 1x1 + resize -> (S, S) (1 channel, folded head)
      7+K  +ipt_blk1-folded conv + add (== birefnet_prefix(cfg, 7))
    Early ASPP sub-prefixes return the stacked branches so every computed
    branch stays live (no DCE)."""
    from dlimgedit_tpu.models import birefnet

    f6 = birefnet_prefix(cfg, 6)
    K = len(cfg.aspp_kernel_sizes)
    if j == 1:
        return f6
    j = j - 1

    def f(params, x):
        S = x.shape[1]
        _p1 = f6(params, x)
        dec = params["decoder"]
        pat = birefnet._get_patches(x, _p1.shape[1])
        _p1 = jnp.concatenate(
            [_p1, birefnet._apply_simple_convs(dec["ipt_blk2"], pat)], -1)
        p = dec["dec1"]
        y = birefnet.relu(birefnet._conv(p["conv_in"], _p1, padding=1))
        if j == 1:
            return y
        ap = p["aspp"]
        branches = [birefnet._apply_deform(ap["aspp1"], y, 1,
                                           cfg.deform_int8_gather)]
        if j == 2:
            return branches[0]
        for i, (bp, s) in enumerate(zip(ap["deforms"], cfg.aspp_kernel_sizes)):
            branches.append(
                birefnet._apply_deform(bp, y, s, cfg.deform_int8_gather))
            if j == 3 + i:
                return jnp.concatenate(branches, axis=-1)
        gap = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
        gap = birefnet.relu(birefnet._conv(ap["gap"], gap.astype(y.dtype)))
        branches.append(jnp.broadcast_to(gap, y.shape[:3] + (gap.shape[-1],)))
        y = birefnet.relu(
            birefnet._conv(ap["proj"], jnp.concatenate(branches, axis=-1)))
        if j == 3 + K:
            return y
        _p1 = birefnet._conv(p["conv_out"], y, padding=1)
        if j == 4 + K:
            return _p1
        if j == 5 + K:
            cp = _p1.shape[-1]
            a = birefnet.conv2d(_p1, dec["head"]["w"][:, :, :cp, :])
            return birefnet.resize_align_corners(a, (S, S))
        return birefnet._head_fold(dec, _p1, x, (S, S))
    return f


def cmd_birefnet_l1(dev, res=1024):
    """Sub-stage decomposition of the dominant birefnet-stages row
    (level1+head) at one resolution."""
    from dlimgedit_tpu.models import birefnet

    cfg = birefnet.BiRefNetConfig(img_size=res)
    names = (["(levels 2..6 baseline)",
              "ipt2 cat + dec1 conv_in", "+aspp1 (1x1 deform)"]
             + [f"+deform k{s}" for s in cfg.aspp_kernel_sizes]
             + ["+gap+proj (ASPP done)", "+conv_out (dec1 done)",
                "+head_a + resize ->S (1ch)", "+ipt1-folded + add (full)"])
    x = jax.device_put(_img(res), dev)
    p = jax.device_put(_bf16(birefnet.init_birefnet(
        jax.random.PRNGKey(0), cfg)), dev)
    print(f"--- birefnet level1+head sub-stages @{res} ---", flush=True)
    _stage_ledger(names, lambda k, c=cfg: birefnet_l1_prefix(c, k), p, x)


def cmd_vit_prefix(dev, variant="vit_h"):
    """Cumulative prefix timing of one ViT encoder: patch embed + the first
    k blocks (k = 0, 4, 8, ... depth) + neck. The deltas include every
    in-context glue cost (qkv split transposes, window partition, residual
    adds) that the isolated per-op ledger cannot see."""
    import dataclasses as dc

    from dlimgedit_tpu.models import vit_sam

    cfg = dc.replace(vit_sam.VIT_PRESETS[variant](1024),
                     use_flash_attention=True)
    p = jax.device_put(_bf16(vit_sam.init_sam_vit(jax.random.PRNGKey(0),
                                                  cfg)), dev)
    x = jax.device_put(_img(), dev)

    def prefix(k):
        def f(pp, xx):
            y = vit_sam._patch_embed(pp["patch_embed"], xx, cfg.patch_size)
            if cfg.use_abs_pos and "pos_embed" in pp:
                y = y + pp["pos_embed"].astype(y.dtype)
            for i in range(k):
                window = (0 if i in cfg.global_attn_indexes
                          else cfg.window_size)
                y = vit_sam._vit_block(pp["blocks"][i], y, cfg, window)
            return y
        return f

    prev = 0.0
    ks = list(range(0, cfg.depth + 1, 4))
    for k in ks:
        f = prefix(k)
        ms = slope_ms(lambda pp, xx, e, f=f: f(
            pp, xx * (1 + e).astype(xx.dtype)), (p, x))
        n_glob = sum(1 for i in range(max(k - 4, 0), k)
                     if i in cfg.global_attn_indexes)
        print(f"+{k:2d} blocks: cum {ms:7.2f} ms  delta {ms - prev:7.2f} ms"
              f"  ({4 - n_glob} windowed + {n_glob} global)"
              if k else f"patch+pos : cum {ms:7.2f} ms", flush=True)
        prev = ms


# ---------------------------------------------------------------------------
# Per-op MFU / bandwidth ledger (VERDICT round-2 #1)
# ---------------------------------------------------------------------------

# v5e single-chip peaks (public spec: 197 TFLOP/s bf16, 819 GB/s HBM).
PEAK_TFLOPS_BF16 = 197.0
PEAK_GBPS_HBM = 819.0


def _mfu_row(name, ms, gflop, mbytes, n_layers=1):
    """One ledger line: measured ms vs FLOP roofline vs HBM roofline."""
    tflops = gflop / ms if ms > 0 else 0.0  # GFLOP/ms == TFLOP/s
    mfu = 100.0 * tflops / PEAK_TFLOPS_BF16
    bw = mbytes / ms if ms > 0 else 0.0     # MB/ms == GB/s
    bwu = 100.0 * bw / PEAK_GBPS_HBM
    floor = max(gflop / PEAK_TFLOPS_BF16, mbytes / PEAK_GBPS_HBM)
    tot = ms * n_layers
    print(f"{name:28s} {ms:8.3f} ms x{n_layers:2d} = {tot:7.2f} ms  "
          f"{gflop:8.2f} GF  {mfu:5.1f}% MFU  {bwu:5.1f}% HBM  "
          f"floor {floor:6.3f} ms", flush=True)
    return tot


def cmd_mfu(dev, variant="vit_h"):
    """Per-op ledger for one SAM ViT encoder: each component measured in
    isolation (slope method) and priced against both rooflines. The floor
    column = max(FLOP time at peak MXU, byte time at peak HBM)."""
    import dataclasses as dc

    from dlimgedit_tpu.models import vit_sam
    from dlimgedit_tpu.models.common import conv2d, gelu, linear
    from dlimgedit_tpu.ops.flash_attention import (attention_reference,
                                                   flash_attention_relpos)
    from dlimgedit_tpu.ops.fused_norm import fused_layer_norm

    cfg = dc.replace(vit_sam.VIT_PRESETS[variant](1024),
                     use_flash_attention=True)
    C = cfg.embed_dim
    nh = cfg.num_heads
    hd = C // nh
    g = cfg.grid                       # 64
    N = g * g                          # 4096 tokens
    ws = cfg.window_size               # 14
    nwin = (-(-g // ws)) ** 2          # padded windows per image (25)
    nwt = ws * ws                      # tokens per window (196)
    n_global = len(cfg.global_attn_indexes)
    n_window = cfg.depth - n_global
    hidden = int(C * cfg.mlp_ratio)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    B2 = 2  # bytes/elem

    def put(shape, scale=0.1):
        return jax.device_put(
            (rng.standard_normal(shape) * scale).astype(bf), dev)

    x_tok = put((1, N, C))
    x_sp = put((1, g, g, C))
    print(f"== {variant} @1024: {cfg.depth} layers ({n_window} windowed + "
          f"{n_global} global), C={C}, heads={nh}, hd={hd} ==", flush=True)
    total = 0.0

    # patch embed: 1024x1024x3 -> 64x64xC, space-to-depth matmul form
    # (vit_sam._patch_embed; the conv lowering measured 2.9% MFU)
    img = put((1, 1024, 1024, 3), 0.5)
    pe = {"w": put((cfg.patch_size, cfg.patch_size, 3, C)),
          "b": put((C,))}
    ms = slope_ms(lambda im, e: vit_sam._patch_embed(
        {"w": pe["w"], "b": pe["b"]}, im * (1 + e).astype(im.dtype),
        cfg.patch_size), (img,))
    total += _mfu_row("patch_embed (s2d matmul)", ms,
                      2 * N * C * cfg.patch_size ** 2 * 3 / 1e9,
                      (1024 * 1024 * 3 + N * C) * B2 / 1e6)

    # fused LayerNorm (2 per layer)
    scale_ = put((C,))
    bias_ = put((C,))
    ms = slope_ms(lambda xx, s, b, e: fused_layer_norm(
        xx * (1 + e).astype(xx.dtype), s, b), (x_sp, scale_, bias_))
    total += _mfu_row("layer_norm", ms, 10 * N * C / 1e9,
                      2 * N * C * B2 / 1e6, 2 * cfg.depth)

    # qkv projection (every layer)
    wqkv = put((C, 3 * C))
    bqkv = put((3 * C,))
    ms = slope_ms(lambda xx, w, b, e: jnp.dot(
        xx * (1 + e).astype(xx.dtype), w,
        preferred_element_type=jnp.float32).astype(xx.dtype) + b,
        (x_tok, wqkv, bqkv))
    total += _mfu_row("qkv matmul", ms, 2 * N * C * 3 * C / 1e9,
                      (N * C * 4 + 3 * C * C) * B2 / 1e6, cfg.depth)

    # attention core, windowed geometry: G = nwin*nh groups of 196 tokens
    Gw = nwin * nh
    qw, kw, vw = put((Gw, nwt, hd)), put((Gw, nwt, hd)), put((Gw, nwt, hd))
    rh_w = put((2 * ws - 1, hd))
    fl_w = 4 * Gw * nwt * nwt * hd / 1e9
    by_w = 4 * Gw * nwt * hd * B2 / 1e6
    ms = slope_ms(lambda q, k, v, e: flash_attention_relpos(
        q * (1 + e).astype(q.dtype), k, v, rh_w, rh_w, grid_h=ws,
        grid_w=ws, heads=nh), (qw, kw, vw))
    total += _mfu_row("window attn core (pallas)", ms, fl_w, by_w, n_window)
    idx = np.arange(ws)[:, None] - np.arange(ws)[None, :] + ws - 1
    rh_wg = jnp.take(rh_w, jnp.asarray(idx), axis=0)
    ms = slope_ms(lambda q, k, v, e: attention_reference(
        q * (1 + e).astype(q.dtype), k, v, rh_wg, rh_wg, ws, ws),
        (qw, kw, vw))
    _mfu_row("window attn core (dense)", ms, fl_w, by_w, n_window)

    # attention core, global geometry: nh groups of 4096 tokens
    qg, kg, vg = put((nh, N, hd)), put((nh, N, hd)), put((nh, N, hd))
    rh_g = put((2 * g - 1, hd))
    fl_g = 4 * nh * N * N * hd / 1e9
    by_g = 4 * nh * N * hd * B2 / 1e6
    ms = slope_ms(lambda q, k, v, e: flash_attention_relpos(
        q * (1 + e).astype(q.dtype), k, v, rh_g, rh_g, grid_h=g, grid_w=g),
        (qg, kg, vg))
    total += _mfu_row("global attn core (pallas)", ms, fl_g, by_g, n_global)

    # attention output projection (every layer)
    wp = put((C, C))
    bp = put((C,))
    ms = slope_ms(lambda xx, w, b, e: jnp.dot(
        xx * (1 + e).astype(xx.dtype), w,
        preferred_element_type=jnp.float32).astype(xx.dtype) + b,
        (x_tok, wp, bp))
    total += _mfu_row("proj matmul", ms, 2 * N * C * C / 1e9,
                      (2 * N * C + C * C) * B2 / 1e6, cfg.depth)

    # MLP: lin1 -> gelu -> lin2 (every layer)
    w1 = put((C, hidden))
    b1 = put((hidden,))
    w2 = put((hidden, C))
    b2 = put((C,))
    ms = slope_ms(
        lambda xx, ww1, bb1, ww2, bb2, e: jnp.dot(
            gelu(jnp.dot(xx * (1 + e).astype(xx.dtype), ww1,
                         preferred_element_type=jnp.float32
                         ).astype(xx.dtype) + bb1), ww2,
            preferred_element_type=jnp.float32).astype(xx.dtype) + bb2,
        (x_tok, w1, b1, w2, b2))
    total += _mfu_row("mlp (lin1+gelu+lin2)", ms, 4 * N * C * hidden / 1e9,
                      (2 * N * C + N * hidden + 2 * C * hidden) * B2 / 1e6,
                      cfg.depth)

    # window partition + unpartition round trip (forced materialisation;
    # inside the encoder XLA fuses these into neighbours)
    from dlimgedit_tpu.models.tinyvit import (_window_partition,
                                              _window_unpartition)

    def part_round(xx, e):
        wx, meta = _window_partition(xx * (1 + e).astype(xx.dtype), ws)
        wx = wx.reshape(-1, nwt, C) * 1.0000001
        return _window_unpartition(wx, ws, meta, g, g, C)

    ms = slope_ms(part_round, (x_sp,))
    _mfu_row("window part+unpart (isol.)", ms, 0.0, 4 * N * C * B2 / 1e6,
             n_window)

    # neck convs
    wn1 = put((1, 1, C, 256))
    wn2 = put((3, 3, 256, 256))
    ms = slope_ms(lambda xx, a, b, e: conv2d(
        conv2d(xx * (1 + e).astype(xx.dtype), a), b, padding=1), (x_sp, wn1, wn2))
    total += _mfu_row("neck convs", ms,
                      (2 * N * C * 256 + 2 * N * 256 * 256 * 9) / 1e9,
                      (N * C + 2 * N * 256) * B2 / 1e6)

    print(f"{'accounted (sum of rows)':28s} {total:8.2f} ms", flush=True)

    # whole encoder, same config, for the unaccounted residual
    from dlimgedit_tpu.models import vit_sam as vs

    p = jax.device_put(_bf16(vs.init_sam_vit(jax.random.PRNGKey(0), cfg)),
                       dev)
    ms = slope_ms(lambda pp, xx, e: vs.sam_vit_apply(
        pp, xx * (1 + e).astype(xx.dtype), cfg), (p, img))
    print(f"{'full encode (measured)':28s} {ms:8.2f} ms  "
          f"(residual {ms - total:+.2f} ms = fusion/layout effects)",
          flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("command", choices=["encoders", "batch", "attention",
                                        "tinyvit-stages", "mfu", "birefnet",
                                        "birefnet-stages", "birefnet-l1",
                                        "vit-prefix", "amg"])
    ap.add_argument("--grid", type=int, default=32,
                    help="amg: prompt-grid side (grid^2 points)")
    ap.add_argument("--res", type=int, default=0,
                    help="birefnet-l1: canvas resolution (default 1024); "
                         "birefnet: 0 = both (default), else restrict")
    ap.add_argument("--exact", action="store_true",
                    help="birefnet: skip the int8-deform leg")
    ap.add_argument("--variant", default=None,
                    help="encoder variant (mfu/vit-prefix default vit_h; "
                         "batch defaults mobile_sam)")
    ap.add_argument("--quant", default="none", choices=["none", "w8", "w8a8"],
                    help="batch/encoders: quantise the encoder (Environment-exact "
                         "flow) before the sweep")
    args = ap.parse_args(argv)
    dev = jax.devices()[0]
    print(f"device: {dev} (platform {dev.platform})", flush=True)
    if args.command == "mfu":
        cmd_mfu(dev, args.variant or "vit_h")
        return 0
    if args.command == "vit-prefix":
        cmd_vit_prefix(dev, args.variant or "vit_h")
        return 0
    if args.command == "batch":
        cmd_batch(dev, quant=args.quant,
                  variant=args.variant or "mobile_sam")
        return 0
    if args.command == "encoders":
        cmd_encoders(dev, quant=args.quant)
        return 0
    if args.command == "birefnet-l1":
        cmd_birefnet_l1(dev, res=args.res or 1024)
        return 0
    if args.command == "amg":
        cmd_amg(dev, variant=args.variant or "mobile_sam", grid=args.grid)
        return 0
    if args.command == "birefnet":
        cmd_birefnet(dev, only_res=args.res, exact_only=args.exact)
        return 0
    {"attention": cmd_attention, "tinyvit-stages": cmd_tinyvit_stages,
     "birefnet-stages": cmd_birefnet_stages,
     }[args.command](dev)
    return 0


if __name__ == "__main__":
    sys.exit(main())
