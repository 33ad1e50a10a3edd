"""Dichotomous foreground segmentation (BiRefNet) — one-shot full-image mask.

Usage:
    python examples/foreground_extraction.py photo.png cutout.png
"""

import sys

import numpy as np

import dlimgedit_tpu as dl


def main(argv=None, options=None):
    """`argv`/`options` are injectable so the test suite can execute this
    example end-to-end with a tiny random-weight config (test_examples.py);
    run as a script it uses real models from ./models."""
    argv = sys.argv[1:] if argv is None else argv
    src, dst = argv[0], argv[1]
    if options is None:
        backend = (dl.Backend.tpu if dl.is_supported(dl.Backend.tpu)
                   else dl.Backend.cpu)
        options = dl.Options(backend=backend, model_directory="models")
    env = dl.Environment(options)

    img = dl.Image.load(src)
    mask = dl.segment_objects(img, env)  # >1536px inputs auto-select high-res

    # Compose an RGBA cutout: image + mask as alpha.
    rgb = img.pixels[:, :, :3] if img.pixels.shape[2] >= 3 else \
        np.repeat(img.pixels, 3, axis=2)
    rgba = np.dstack([rgb, mask.pixels[:, :, 0]])
    dl.Image.save(dl.ImageView.from_array(rgba, dl.Channels.rgba), dst)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
