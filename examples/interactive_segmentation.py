"""Interactive segmentation: embed once, query many masks.

Usage:
    python examples/interactive_segmentation.py photo.png 320 210 out_mask.png

Equivalent C++ (header native/include/dlimgedit/dlimgedit.hpp):
    auto env = dlimg::Environment({dlimg::Backend::gpu, "models"});
    auto seg = dlimg::Segmentation::process(img, env);
    auto mask = seg.compute_mask(dlimg::Point{320, 210});
"""

import sys

import dlimgedit_tpu as dl


def main():
    path, x, y = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    out = sys.argv[4] if len(sys.argv) > 4 else "mask.png"

    backend = dl.Backend.tpu if dl.is_supported(dl.Backend.tpu) else dl.Backend.cpu
    env = dl.Environment(dl.Options(backend=backend, model_directory="models"))

    img = dl.Image.load(path)
    seg = dl.Segmentation.process(img, env)   # expensive once; cached on device

    # Single best mask for a point.
    mask = seg.compute_mask(dl.Point(x, y))
    dl.Image.save(mask.view(), out)
    print(f"wrote {out} ({mask.extent.width}x{mask.extent.height})")

    # Three ranked candidates (ambiguous prompts).
    for i, m in enumerate(seg.compute_masks(dl.Point(x, y))):
        print(f"candidate {i}: predicted IoU {m.accuracy:.3f}")

    # Box prompt; optionally keep only the largest object in the box.
    h, w = img.extent.height, img.extent.width
    box = dl.Region(dl.Point(w // 4, h // 4), dl.Point(3 * w // 4, 3 * h // 4))
    seg.compute_mask(box, largest_component=True)

    # Many prompts in one device round trip.
    prompts = [dl.Point(x + dx, y) for dx in (-20, 0, 20)]
    batch = seg.compute_mask_batch(prompts)
    print(f"batched {len(batch)} prompts in one dispatch")


if __name__ == "__main__":
    main()
