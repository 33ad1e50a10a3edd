"""Image file I/O.

Mirrors the reference's stb-backed codecs
(/root/reference/src/image.cpp:11-35): load PNG/JPEG/BMP/TGA with channel
validation {1,3,4}, save PNG (mask/rgb/rgba only).

The Python tier uses Pillow; the native C shim (native/) routes through the
same functions so codec behaviour is identical across both entry points.
"""

from __future__ import annotations

import numpy as np

from ..errors import DlimgError, UnsupportedImageError
from ..types import Channels, Extent, Image, ImageView, channel_count


def load_image(filepath: str) -> Image:
    """Load an image file. Supported formats: PNG, JPEG, BMP, TGA.

    Matches image.cpp:11-23 — keeps the file's native channel count and
    rejects anything other than 1/3/4 channels.
    """
    try:
        from PIL import Image as PILImage
    except ImportError as e:  # pragma: no cover
        raise DlimgError("No image codec available (Pillow not installed)") from e
    try:
        with PILImage.open(filepath) as im:
            # Keep native channels like stbi_load(..., desired_channels=0):
            # palette images decode to their underlying mode's channel count.
            if im.mode == "P":
                im = im.convert("RGBA" if "transparency" in im.info else "RGB")
            elif im.mode in ("I", "I;16", "I;16B", "I;16L", "I;16N"):
                # 16/32-bit integer grays: stb's 16->8 semantics keep the
                # HIGH byte. PIL's .convert() would CLIP at 255 instead —
                # a full-range 16-bit scan came out 99.6% pure white.
                wide = np.asarray(im)
                # Pick the shift from the SOURCE format, not the container
                # width or the frame's data range: older Pillow (<10.1)
                # opens 16-bit gray PNGs as mode 'I' (32-bit container)
                # with 0..65535 values — keying on itemsize alone would
                # shift those by 24 and black the image out, and keying on
                # the data range would scale a dark frame of a genuine
                # 32-bit sequence differently from a bright one. PNG caps
                # at 16 bits/channel, so mode 'I' from a PNG is always
                # 16-bit data; only true 32-bit containers from other
                # formats (e.g. int32 TIFF) take the high byte of 32.
                if wide.dtype.itemsize == 2 or im.format == "PNG":
                    shift = 8
                else:
                    shift = 24
                im = PILImage.fromarray(
                    np.clip(wide >> shift, 0, 255).astype(np.uint8), "L")
            elif im.mode not in ("L", "RGB", "RGBA"):
                # gray+alpha promotes to RGBA (matching the native libpng
                # shim's GA promotion); everything else to 8-bit RGB.
                im = im.convert("RGBA" if im.mode in ("LA", "PA") else "RGB")
            arr = np.asarray(im, dtype=np.uint8)
    except (OSError, ValueError) as e:
        raise DlimgError(f"Failed to load image {filepath}: {e}") from e
    if arr.ndim == 2:
        arr = arr[:, :, None]
    c = arr.shape[2]
    if c not in (1, 3, 4):
        raise UnsupportedImageError(
            f"Unsupported number of channels ({c}) in {filepath}"
        )
    channels = {1: Channels.mask, 3: Channels.rgb, 4: Channels.rgba}[c]
    h, w = arr.shape[:2]
    return Image(Extent(w, h), channels, arr)


def save_image(img: ImageView, filepath: str) -> None:
    """Store an image as a PNG file (image.cpp:25-35).

    Only mask/rgb/rgba channel orders are supported, same as the reference.
    """
    if img.channels not in (Channels.mask, Channels.rgb, Channels.rgba):
        raise UnsupportedImageError(f"Unsupported channel order [{img.channels}]")
    from PIL import Image as PILImage

    arr = np.ascontiguousarray(img.pixels)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    mode = {1: "L", 3: "RGB", 4: "RGBA"}[channel_count(img.channels)]
    try:
        PILImage.fromarray(arr, mode=mode).save(filepath, format="PNG")
    except OSError as e:
        raise DlimgError(f"Failed to save image {filepath}: {e}") from e
