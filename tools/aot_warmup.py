#!/usr/bin/env python
"""Pre-compile every inference executable into a persistent cache (AOT).

Deployment analog of the reference shipping pre-built ONNX graphs: run once
at install time, then every later process (Python or the native shim with
DLIMG_COMPILATION_CACHE set) loads serialized executables instead of
recompiling — first-call latency drops from ~seconds (or minutes for big
ViTs through a remote TPU) to cache-read time.

Warms, per canvas bucket: SAM preprocess+encode, single/multi/batch mask
decode, and optionally the BiRefNet programs.

Usage:
    python tools/aot_warmup.py --cache-dir /var/cache/dlimgedit \
        --model-dir models [--variant mobile_sam] [--buckets 512,1024] \
        [--backend gpu] [--birefnet] [--random-weights]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--model-dir", default="models")
    ap.add_argument("--variant", default="mobile_sam")
    ap.add_argument("--buckets", default="1024",
                    help="comma-separated canvas buckets to warm")
    ap.add_argument("--backend", default="cpu", choices=["cpu", "gpu", "tpu"])
    ap.add_argument("--compute-dtype", default=None,
                    help="default: bfloat16 on accelerators, float32 on cpu")
    ap.add_argument("--sam-image-size", type=int, default=1024)
    ap.add_argument("--birefnet", action="store_true",
                    help="also warm the BiRefNet segment_objects programs")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--batch-sizes", default="1,8",
                    help="compute_mask_batch prompt counts to warm (each "
                         "pads to a power of two -> one executable per "
                         "padded size)")
    args = ap.parse_args(argv)

    import numpy as np

    import dlimgedit_tpu as dl

    accel = args.backend != "cpu"
    opts = dl.Options(
        backend=dl.Backend.gpu if accel else dl.Backend.cpu,
        model_directory=args.model_dir,
        allow_random_weights=args.random_weights,
        sam_variant=args.variant,
        sam_image_size=args.sam_image_size,
        compute_dtype=args.compute_dtype or ("bfloat16" if accel else "float32"),
        compilation_cache_dir=args.cache_dir,
    )
    env = dl.Environment(opts)
    rng = np.random.default_rng(0)

    for bucket in [int(b) for b in args.buckets.split(",")]:
        t0 = time.time()
        img = dl.Image(dl.Extent(bucket, bucket), dl.Channels.rgba,
                       rng.integers(0, 256, (bucket, bucket, 4), np.uint8))
        seg = dl.Segmentation.process(img, env, variant=args.variant)
        seg.compute_mask(dl.Point(bucket // 2, bucket // 2))      # single
        seg.compute_masks(dl.Point(bucket // 2, bucket // 2))     # multi
        # Batch decode compiles one executable per PADDED (power-of-two)
        # prompt count; warm each size a deployment will hit, not just 1.
        for n in (int(b) for b in args.batch_sizes.split(",") if b):
            seg.compute_mask_batch(
                [dl.Point(bucket // 2, bucket // 2)] * n)
        print(f"bucket {bucket}: SAM programs compiled+cached "
              f"({time.time() - t0:.1f}s)", flush=True)
        if args.birefnet:
            t0 = time.time()
            from dlimgedit_tpu.runtime.segmentation import segment_objects

            segment_objects(img.view(), env)
            print(f"bucket {bucket}: BiRefNet programs compiled+cached "
                  f"({time.time() - t0:.1f}s)", flush=True)

    print(f"cache ready at {args.cache_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
