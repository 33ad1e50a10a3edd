"""Segment everything: every object mask of an image in one device program.

Usage:
    python examples/generate_masks.py photo.png out_dir/

The upstream-SAM automatic mask generator is a host loop (per-point
predictor calls + numpy filtering + torch NMS; seconds per image).  Here
the point grid, the grid^2 x 3 candidate decodes, the IoU/stability
filters, the greedy box NMS and the top-K mask rendering all run as ONE
XLA program against the cached image embedding — one dispatch, one fetch.
The reference library has no counterpart feature.
"""

import os
import sys

import dlimgedit_tpu as dl


def main(argv=None, options=None, grid=32, max_masks=32):
    """`argv`/`options`/`grid` are injectable so the test suite executes
    this example end-to-end with a tiny random-weight config."""
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0]
    out_dir = argv[1] if len(argv) > 1 else "masks"

    if options is None:
        backend = (dl.Backend.tpu if dl.is_supported(dl.Backend.tpu)
                   else dl.Backend.cpu)
        options = dl.Options(backend=backend, model_directory="models")
    env = dl.Environment(options)

    img = dl.Image.load(path)
    seg = dl.Segmentation.process(img, env)  # embed once

    masks = seg.generate_masks(grid=grid, max_masks=max_masks)
    os.makedirs(out_dir, exist_ok=True)
    for i, m in enumerate(masks):
        dl.Image.save(m.image.view(), os.path.join(out_dir, f"mask_{i:03d}.png"))
    print(f"generated {len(masks)} masks "
          f"(best predicted IoU {masks[0].accuracy:.3f})"
          if masks else "generated 0 masks")


if __name__ == "__main__":
    main()
