#!/usr/bin/env python
"""Benchmark harness: Segmentation::process and compute_mask latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, ...}

Baselines (BASELINE.md): reference GPU (RTX 4070) process ~50 ms,
compute_mask ~12 ms/mask; rebuild targets <50 ms process, <5 ms/mask on one
v5e chip. `value` is the median end-to-end Segmentation::process latency;
`vs_baseline` = 50 ms / value (>1 == faster than the reference GPU).

Also reported: end-to-end compute_mask (includes the host<->device mask
transfer — on remote-attached/tunneled TPUs this is RPC-latency-bound) and
device-dispatch-only latencies (the on-chip truth, what a co-located host
would see).
"""

import argparse
import json
import statistics
import time

import numpy as np


def median_ms(fn, iters):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="mobile_sam")
    ap.add_argument("--size", type=int, default=1024, help="input image size")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--compute-dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    import dlimgedit_tpu as dl
    from dlimgedit_tpu.runtime.segmentation import (
        _build_decode_fn,
        _build_embed_fn,
    )
    from dlimgedit_tpu.ops.preprocess import pack_rgb_canvas, pick_bucket

    accel = dl.is_supported(dl.Backend.gpu)
    env = dl.Environment(dl.Options(
        backend=dl.Backend.gpu if accel else dl.Backend.cpu,
        allow_random_weights=True,
        compute_dtype=args.compute_dtype if accel else "float32",
    ))

    rng = np.random.default_rng(0)
    img = dl.Image(dl.Extent(args.size, args.size), dl.Channels.rgba,
                   rng.integers(0, 256, (args.size, args.size, 4),
                                dtype=np.uint8))

    # Warmup every executable AND every fetch path (first D2H per program can
    # stall on remote-attached TPUs).
    for _ in range(3):
        seg = dl.Segmentation.process(img, env, variant=args.variant)
        seg.compute_mask(dl.Point(args.size // 2, args.size // 2))
        seg.compute_masks(dl.Point(args.size // 2, args.size // 2))

    # --- end-to-end latencies (host pixels in -> host mask out) -------------
    def do_process():
        s = dl.Segmentation.process(img, env, variant=args.variant)
        s.embedding.block_until_ready()
        return s

    process_ms = median_ms(do_process, args.iters)

    seg = dl.Segmentation.process(img, env, variant=args.variant)
    pts = [dl.Point(int(x), int(y))
           for x, y in rng.integers(8, args.size - 8, (args.iters, 2))]
    it = iter(pts * 2)
    mask_ms = median_ms(lambda: seg.compute_mask(next(it)), args.iters)

    # --- device-dispatch-only latencies (no host fetch) ----------------------
    bundle = env.sam_model(args.variant)
    bucket = pick_bucket(dl.Extent(args.size, args.size))
    canvas = pack_rgb_canvas(img.view(), bucket)
    sizes = np.array([args.size] * 4, np.int32)
    embed = _build_embed_fn(bundle)
    emb = embed(bundle.params, canvas, sizes)
    emb.block_until_ready()
    dev_process_ms = median_ms(
        lambda: embed(bundle.params, canvas, sizes).block_until_ready(),
        args.iters)
    dec = _build_decode_fn(bundle, bucket, False, False)
    points = np.array([[[512.0, 512.0], [0.0, 0.0]]], np.float32)
    labels = np.array([[1.0, -1.0]], np.float32)
    jax.block_until_ready(dec(bundle.params, emb, points, labels, sizes))
    dev_mask_ms = median_ms(
        lambda: jax.block_until_ready(
            dec(bundle.params, emb, points, labels, sizes)), args.iters)

    platform = jax.devices()[0].platform
    baseline_process_ms = 50.0  # reference GPU (README.md:35)
    print(json.dumps({
        "metric": f"SAM {args.variant} Segmentation::process ms/image "
                  f"@{args.size}px ({platform})",
        "value": round(process_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_process_ms / process_ms, 3),
        "compute_mask_ms": round(mask_ms, 3),
        "compute_mask_vs_baseline": round(12.0 / mask_ms, 3),
        "device_process_ms": round(dev_process_ms, 3),
        "device_compute_mask_ms": round(dev_mask_ms, 3),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
