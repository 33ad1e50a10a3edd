#!/usr/bin/env python
"""Benchmark harness: Segmentation::process and compute_mask latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, ...}

Baselines (BASELINE.md): reference GPU (RTX 4070) process ~50 ms,
compute_mask ~12 ms; rebuild targets <50 ms process, <5 ms/mask on one
v5e chip. vs_baseline is reported against the 50 ms process baseline
(>1 means faster than baseline).
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="mobile_sam")
    ap.add_argument("--size", type=int, default=1024, help="input image size")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--compute-dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    import dlimgedit_tpu as dl

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

    # Warmup (compiles)
    for _ in range(max(1, args.warmup)):
        seg = dl.Segmentation.process(img, env, variant=args.variant)
        seg.compute_mask(dl.Point(args.size // 2, args.size // 2))

    # process latency (embed): end-to-end host-to-mask-cache
    t0 = time.perf_counter()
    for _ in range(args.iters):
        seg = dl.Segmentation.process(img, env, variant=args.variant)
        seg.embedding.block_until_ready()
    process_ms = (time.perf_counter() - t0) / args.iters * 1e3

    # compute_mask latency: prompt -> uint8 mask on host
    seg = dl.Segmentation.process(img, env, variant=args.variant)
    pts = [dl.Point(int(x), int(y))
           for x, y in rng.integers(8, args.size - 8, (args.iters, 2))]
    seg.compute_mask(pts[0])  # ensure compiled
    t0 = time.perf_counter()
    for p in pts:
        seg.compute_mask(p)
    mask_ms = (time.perf_counter() - t0) / args.iters * 1e3

    platform = jax.devices()[0].platform
    baseline_process_ms = 50.0  # reference GPU number (README.md:35)
    print(json.dumps({
        "metric": f"SAM {args.variant} Segmentation::process ms/image "
                  f"@{args.size}px ({platform})",
        "value": round(process_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_process_ms / process_ms, 3),
        "compute_mask_ms": round(mask_ms, 3),
        "compute_mask_vs_baseline": round(12.0 / mask_ms, 3),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
