"""Dichotomous foreground segmentation (BiRefNet) — one-shot full-image mask.

Usage:
    python examples/foreground_extraction.py photo.png cutout.png
"""

import sys

import numpy as np

import dlimgedit_tpu as dl


def main():
    src, dst = sys.argv[1], sys.argv[2]
    backend = dl.Backend.tpu if dl.is_supported(dl.Backend.tpu) else dl.Backend.cpu
    env = dl.Environment(dl.Options(backend=backend, model_directory="models"))

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
