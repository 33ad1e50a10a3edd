#!/usr/bin/env python
"""End-to-end check of the native PJRT serving mode.

1. Exports the serving bundle (tools/aot_export.py --program serving) if
   the target dir has none.
2. Computes the Python pipeline's mask for a fixed synthetic image
   (Segmentation.process + compute_mask) and writes image/golden/meta.
3. Runs native/build/test_serving in a FRESH process with
   DLIMG_PJRT_BUNDLE set: the public C++ API computes the same mask
   through the PJRT C API (no Python initialised) and requires
   pixel-exact agreement.

Run on the TPU-attached host:
    python tools/serving_check.py --dir /tmp/dlimg_serving
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/dlimg_serving")
    ap.add_argument("--variant", default="mobile_sam")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--birefnet", default="",
                    help="also export + check segment_objects (e.g. "
                         "general:1024)")
    ap.add_argument("--birefnet-resolution", type=int, default=0,
                    help="override the BiRefNet model resolution "
                         "(DLIMG_BIREFNET_RESOLUTION) for export, golden "
                         "AND native. Hermetic runs set it to the bucket so "
                         "the mask needs no host resize: the box filter's "
                         ".5-ties flip ~1/16 of pixels by one grey level at "
                         "a 16:1 ratio (1024-res model on a 256 image), "
                         "which is benign but breaks the strict 0-diff "
                         "contract this check enforces")
    ap.add_argument("--quantize", action="store_true",
                    help="check the int8-weight serving bundle (use a "
                         "separate --dir per quant mode)")
    ap.add_argument("--quantize-activations", action="store_true",
                    help="check the s8 x s8 serving bundle")
    ap.add_argument("--int8-deform", action="store_true",
                    help="check the int8-deform BiRefNet serving bundle")
    ap.add_argument("--amg", default="16:32",
                    help="grid:max_masks for the automatic-mask-generation "
                         "leg ('' disables; exported + checked bit-exact "
                         "native-vs-Python)")
    ap.add_argument("--backend", default="gpu", choices=["gpu", "cpu"],
                    help="cpu = fully hermetic: bundle exported for and "
                         "served by the repo's own CPU PJRT plugin "
                         "(libdlimg_pjrt_cpu.so), golden computed on "
                         "XLA:CPU — no accelerator, no relay")
    ap.add_argument("--sam-image-size", type=int, default=0,
                    help="override SAM model resolution (hermetic runs "
                         "use tiny geometries)")
    args = ap.parse_args()
    if args.backend == "cpu":
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
    if args.birefnet_resolution:
        # Inherited by the aot_export, golden, and native subprocesses.
        os.environ["DLIMG_BIREFNET_RESOLUTION"] = str(
            args.birefnet_resolution)
    os.makedirs(args.dir, exist_ok=True)

    # Two buckets: the main image exercises args.size, the secondary
    # small-image leg exercises half-size bucket selection in the C shim.
    bucket = args.size
    buckets = sorted({bucket // 2, bucket})
    markers = [os.path.join(args.dir, f"serve_decode_{args.variant}_{b}.pjrt")
               for b in buckets]
    if not all(os.path.exists(m) for m in markers):
        cmd = [sys.executable, os.path.join(REPO, "tools", "aot_export.py"),
               "--out", args.dir, "--program", "serving",
               "--variant", args.variant,
               "--buckets", ",".join(map(str, buckets)),
               "--backend", args.backend]
        if args.sam_image_size:
            cmd += ["--sam-image-size", str(args.sam_image_size)]
        if args.birefnet:
            cmd += ["--birefnet", args.birefnet]
        if args.amg:
            cmd += ["--amg", args.amg]
        if args.quantize:
            cmd += ["--quantize"]
        if args.quantize_activations:
            cmd += ["--quantize-activations"]
        if args.int8_deform:
            cmd += ["--int8-deform"]
        r = subprocess.run(cmd)
        if r.returncode != 0:
            return r.returncode

    # Golden in its OWN subprocess: it holds a live TPU client, and the
    # native binary creates another — never run two TPU clients at once
    # (CLAUDE.md), so the golden process must have exited first.
    golden_code = f"""
import sys
sys.path.insert(0, {REPO!r})
import numpy as np
import dlimgedit_tpu as dl
rng = np.random.default_rng(0)
size = {args.size}
img_px = rng.integers(0, 256, (size, size, 4), dtype=np.uint8)
img = dl.Image(dl.Extent(size, size), dl.Channels.rgba, img_px)
import os
extra = {{}}
if {args.sam_image_size}:
    extra["sam_image_size"] = {args.sam_image_size}
env = dl.Environment(dl.Options(
    backend=dl.Backend.{args.backend}, allow_random_weights=True,
    compute_dtype="bfloat16",
    quantize_encoder={args.quantize!r},
    quantize_activations={args.quantize_activations!r},
    birefnet_int8_deform={args.int8_deform!r},
    compilation_cache_dir=os.environ.get(
        "DLIMG_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/dlimgedit_tpu/xla")),
    **extra))
seg = dl.Segmentation.process(img, env, variant={args.variant!r})
point = (size // 2, size // 2)
region = (size // 8, size // 8, size // 2, (3 * size) // 4)
mask = seg.compute_mask(dl.Point(*point))
open({args.dir!r} + "/image.raw", "wb").write(img_px.tobytes())
open({args.dir!r} + "/golden.raw", "wb").write(mask.pixels.tobytes())
open({args.dir!r} + "/meta.txt", "w").write(
    f"{{size}} {{size}} 4 {{point[0]}} {{point[1]}} "
    f"{{region[0]}} {{region[1]}} {{region[2]}} {{region[3]}}\\n")
# 3-mask decode (compute_masks) + confidences.
cands = seg.compute_masks(dl.Point(*point))
open({args.dir!r} + "/golden3.raw", "wb").write(
    b"".join(m.image.pixels.tobytes() for m in cands))
np.array([m.accuracy for m in cands], np.float32).tofile(
    {args.dir!r} + "/golden3_iou.raw")
# Region (box) prompt.
rmask = seg.compute_mask(dl.Region(dl.Point(region[0], region[1]),
                                   dl.Point(region[2], region[3])))
open({args.dir!r} + "/golden_region.raw", "wb").write(
    rmask.pixels.tobytes())
# Secondary non-square small image: exercises half-size bucket selection
# and the resize-longest-side scale/crop math (500 -> model 1024, bucket
# {args.size // 2}).
sw, sh = (size * 500) // 1024, (size * 375) // 1024
simg_px = rng.integers(0, 256, (sh, sw, 3), dtype=np.uint8)
simg = dl.Image(dl.Extent(sw, sh), dl.Channels.rgb, simg_px)
sseg = dl.Segmentation.process(simg, env, variant={args.variant!r})
spoint = (sw // 2, sh // 2)
smask = sseg.compute_mask(dl.Point(*spoint))
open({args.dir!r} + "/image_small.raw", "wb").write(simg_px.tobytes())
open({args.dir!r} + "/golden_small.raw", "wb").write(
    smask.pixels.tobytes())
open({args.dir!r} + "/meta_small.txt", "w").write(
    f"{{sw}} {{sh}} 3 {{spoint[0]}} {{spoint[1]}}\\n")
if {bool(args.birefnet)!r}:
    obj = dl.segment_objects(img, env)
    open({args.dir!r} + "/golden_objects.raw", "wb").write(
        obj.pixels.tobytes())
if {args.amg!r}:
    # Same grid/max_masks as the exported serve_amg program (identical
    # builder + static config -> identical executable -> bit-exact).
    g, k = (int(v) for v in {args.amg!r}.split(":"))
    thr = (0.5, 0.5, 0.7)
    gen = seg.generate_masks(grid=g, max_masks=k, iou_thresh=thr[0],
                             stability_thresh=thr[1], nms_thresh=thr[2])
    open({args.dir!r} + "/golden_amg.raw", "wb").write(
        b"".join(m.image.pixels.tobytes() for m in gen))
    np.array([m.accuracy for m in gen], np.float32).tofile(
        {args.dir!r} + "/golden_amg_acc.raw")
    open({args.dir!r} + "/meta_amg.txt", "w").write(
        f"{{thr[0]}} {{thr[1]}} {{thr[2]}} {{k}}\\n")
print("golden written")
"""
    r = subprocess.run([sys.executable, "-c", golden_code])
    if r.returncode != 0:
        return r.returncode
    print("running native test_serving", flush=True)

    env_vars = dict(os.environ)
    env_vars["DLIMG_PJRT_BUNDLE"] = args.dir
    env_vars["DLIMG_SERVING_CHECK_DIR"] = args.dir
    r = subprocess.run([os.path.join(REPO, "native", "build",
                                     "test_serving")], env=env_vars)
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
