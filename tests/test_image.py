"""Image layer tests, ported from the reference's test_image.cpp and the pure
sections of test_segmentation.cpp (ResizeLongestSide geometry)."""

import numpy as np
import pytest

from dlimgedit_tpu.image.resize import (
    filter_matrix,
    resize,
    resize_longest_side_extent,
    resize_mask,
    transform_point,
)
from dlimgedit_tpu.image.io import load_image, save_image
from dlimgedit_tpu.types import Channels, Extent, Image, ImageView


# --- ResizeLongestSide geometry (test_segmentation.cpp:15-57) ---------------

def test_resize_longest_side_height_upscale():
    target, _ = resize_longest_side_extent(Extent(13, 19), 26)
    assert target == Extent(18, 26)


def test_resize_longest_side_height_downscale():
    target, _ = resize_longest_side_extent(Extent(13, 19), 10)
    assert target == Extent(7, 10)


def test_resize_longest_side_width_upscale():
    target, _ = resize_longest_side_extent(Extent(19, 13), 26)
    assert target == Extent(26, 18)


def test_resize_longest_side_width_downscale():
    target, _ = resize_longest_side_extent(Extent(19, 13), 10)
    assert target == Extent(10, 7)


def test_transform_point():
    # test_segmentation.cpp:47-57
    _, scale = resize_longest_side_extent(Extent(10, 10), 20)
    assert transform_point(0, 0, scale) == (0, 0)
    assert transform_point(10, 10, scale) == (20, 20)
    assert transform_point(2, 7, scale) == (4, 14)


# --- Filter matrices ---------------------------------------------------------

def test_filter_matrix_rows_normalised():
    for kernel in ("catmull-rom", "mitchell", "box", "triangle"):
        m = filter_matrix(17, 5, kernel)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-12)
        m = filter_matrix(5, 17, kernel)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-12)


def test_filter_matrix_identity():
    # Same-size resize must be identity for interpolating kernels.
    for kernel in ("catmull-rom", "box", "triangle"):
        m = filter_matrix(9, 9, kernel)
        np.testing.assert_allclose(m, np.eye(9), atol=1e-12)


def test_box_downscale_2x_is_average():
    m = filter_matrix(8, 4, "box")
    expected = np.zeros((4, 8))
    for i in range(4):
        expected[i, 2 * i] = 0.5
        expected[i, 2 * i + 1] = 0.5
    np.testing.assert_allclose(m, expected, atol=1e-12)


# --- resize / resize_mask ----------------------------------------------------

def test_resize_constant_image_stays_constant():
    img = Image(Extent(32, 24), Channels.rgb, np.full((24, 32, 3), 77, np.uint8))
    out = resize(img, Extent(13, 9))
    assert out.extent == Extent(13, 9)
    assert np.all(out.pixels == 77)
    out = resize(img, Extent(64, 48))
    assert np.all(out.pixels == 77)


def test_resize_mask_box_downscale():
    arr = np.zeros((4, 4), dtype=np.uint8)
    arr[:2, :2] = 255
    out = resize_mask(ImageView.from_array(arr, Channels.mask), Extent(2, 2))
    assert out.shape == (2, 2)
    assert out[0, 0] == 255
    assert out[0, 1] == 0
    assert out[1, 0] == 0
    assert out[1, 1] == 0


def test_resize_mask_preserves_binary_levels():
    rng = np.random.default_rng(1)
    arr = (rng.random((64, 48)) > 0.5).astype(np.uint8) * 255
    out = resize_mask(ImageView.from_array(arr, Channels.mask), Extent(48, 64))
    assert out.shape == (64, 48)
    assert out.min() >= 0 and out.max() <= 255


# --- I/O round trips (test_image.cpp) ----------------------------------------

def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
    img = Image(Extent(30, 20), Channels.rgba, arr)
    p = tmp_path / "roundtrip.png"
    save_image(img.view(), str(p))
    loaded = load_image(str(p))
    assert loaded.extent == Extent(30, 20)
    assert loaded.channels == Channels.rgba
    np.testing.assert_array_equal(loaded.pixels, arr)


def test_mask_png_roundtrip(tmp_path):
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    img = Image(Extent(8, 8), Channels.mask, arr)
    p = tmp_path / "mask.png"
    save_image(img.view(), str(p))
    loaded = load_image(str(p))
    assert loaded.channels == Channels.mask
    np.testing.assert_array_equal(loaded.pixels[:, :, 0], arr)


def test_save_unsupported_channels_raises(tmp_path):
    from dlimgedit_tpu.errors import UnsupportedImageError

    arr = np.zeros((4, 4, 4), dtype=np.uint8)
    v = ImageView(arr, Extent(4, 4), Channels.bgra)
    with pytest.raises(UnsupportedImageError):
        save_image(v, str(tmp_path / "x.png"))


def test_load_real_reference_input():
    # truck.jpg is the one non-LFS asset in the reference tree.
    import os

    path = "/root/reference/test/input/truck.jpg"
    if not os.path.exists(path):
        pytest.skip("reference test input not available")
    img = load_image(path)
    assert img.extent == Extent(1800, 1200)
    assert img.channels == Channels.rgb


def test_resize_gradient_matches_reference_expectations():
    """Port of the reference's 'Image resize' test (test_image.cpp:52-71):
    an 8x8 per-axis gradient downscaled 2x must hit exactly 2 + 8*k —
    validating the sRGB-aware Mitchell downsample numerics."""
    arr = np.zeros((8, 8, 4), np.uint8)
    for i in range(8 * 8):
        y, x = divmod(i, 8)
        arr[y, x] = (255, 4 * y, 4 * x, 255)
    img = Image(Extent(8, 8), Channels.rgba, arr)
    result = resize(img, Extent(4, 4))
    assert result.extent == Extent(4, 4)
    for i in range(16):
        y, x = divmod(i, 4)
        px = result.pixels[y, x]
        assert px[0] == 255
        assert int(px[1]) == 2 + 8 * y, (y, x, px)
        assert int(px[2]) == 2 + 8 * x, (y, x, px)
        assert px[3] == 255


def test_save_load_value_preservation(tmp_path):
    """Port of the reference's 'Image save' test (test_image.cpp:27-49)."""
    arr = np.zeros((16, 16, 4), np.uint8)
    for i in range(16 * 16):
        y, x = divmod(i, 16)
        arr[y, x] = (255, i % 256, 0, 255)
    img = Image(Extent(16, 16), Channels.rgba, arr)
    p = tmp_path / "save.png"
    save_image(img.view(), str(p))
    loaded = load_image(str(p))
    np.testing.assert_array_equal(loaded.pixels, arr)


def test_load_16bit_png_keeps_high_byte(tmp_path):
    """16-bit grayscale PNGs decode with stb's 16->8 high-byte semantics
    (regression: PIL's .convert() CLIPPED at 255, turning a full-range
    16-bit scan 99.6% pure white)."""
    from PIL import Image as PILImage

    wide = (np.arange(32 * 32, dtype=np.uint32) * 64).astype(np.uint16) \
        .reshape(32, 32)
    p = tmp_path / "gray16.png"
    PILImage.fromarray(wide).save(p)  # uint16 -> mode I;16
    loaded = load_image(str(p))
    assert loaded.channels == Channels.mask
    np.testing.assert_array_equal(loaded.pixels[:, :, 0],
                                  (wide >> 8).astype(np.uint8))


def test_load_mode_I_with_16bit_range_data(monkeypatch, tmp_path):
    """Pillow < 10.1 opens 16-bit gray PNGs as mode 'I' (32-bit container)
    with 0..65535 data; the shift must follow the SOURCE format (PNG caps
    at 16 bits/channel), not the container width (shifting by 24 blacked
    the image out)."""
    from PIL import Image as PILImage

    wide = (np.arange(16 * 16, dtype=np.uint32) * 257).astype(np.uint16) \
        .reshape(16, 16)
    p = tmp_path / "gray16.png"
    PILImage.fromarray(wide).save(p)
    # Force the old-Pillow behaviour: the opened image presents as mode 'I'
    # int32 with the same 16-bit-range values.
    real_open = PILImage.open

    class _ModeI:
        def __init__(self, im):
            self._im = im.convert("I")
            self.mode = "I"
            self.format = "PNG"
            self.info = {}

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._im.close()

        def __array__(self, dtype=None, copy=None):
            return np.asarray(self._im)

    monkeypatch.setattr(PILImage, "open",
                        lambda fp: _ModeI(real_open(fp)))
    loaded = load_image(str(p))
    np.testing.assert_array_equal(loaded.pixels[:, :, 0],
                                  (wide >> 8).astype(np.uint8))


def test_load_mode_I_32bit_tiff_scales_consistently(tmp_path):
    """A genuine 32-bit integer source (int32 TIFF -> PIL mode 'I') always
    takes the high byte of 32, even for a dark frame whose values happen
    to sit below 65536 — a data-range heuristic would scale two frames of
    the same sequence differently across that threshold."""
    from PIL import Image as PILImage

    bright = (np.arange(16 * 16, dtype=np.int64) * 16_000_000) \
        .astype(np.int32).reshape(16, 16)
    dark = (bright // (1 << 16)).astype(np.int32)  # same scene, <65536
    for name, frame in (("bright.tiff", bright), ("dark.tiff", dark)):
        PILImage.fromarray(frame, mode="I").save(tmp_path / name)
        loaded = load_image(str(tmp_path / name))
        np.testing.assert_array_equal(
            loaded.pixels[:, :, 0],
            np.clip(frame >> 24, 0, 255).astype(np.uint8))


# --- stb container parity: GIF/PSD/PNM/HDR (image.cpp:11-23 accepts any
# stb-readable container; both our tiers must agree on shapes/values) -------


def test_load_gif_is_rgba(tmp_path):
    """GIF decodes to RGBA in stb and the native shim; the Python tier must
    agree even for fully opaque files."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(5)
    arr = (rng.integers(0, 4, (6, 7), dtype=np.uint8) * 60)
    rgb = np.stack([arr, arr // 2, 255 - arr], axis=-1)
    p = tmp_path / "img.gif"
    PILImage.fromarray(rgb).save(p)
    img = load_image(str(p))
    assert img.channels == Channels.rgba
    ref = np.asarray(PILImage.open(p).convert("RGBA"))
    np.testing.assert_array_equal(img.pixels, ref)


def test_load_pnm(tmp_path):
    p = tmp_path / "img.ppm"
    rng = np.random.default_rng(6)
    arr = np.ascontiguousarray(rng.integers(0, 256, (4, 5, 3), np.uint8))
    from PIL import Image as PILImage

    PILImage.fromarray(arr).save(p)
    img = load_image(str(p))
    assert img.channels == Channels.rgb
    np.testing.assert_array_equal(img.pixels, arr)


def test_load_hdr_matches_stb_conversion(tmp_path):
    """Built-in Radiance reader (Pillow has no HDR plugin): RGBE with stb's
    LDR defaults — v = c * 2^(e-136), gamma 2.2 — same as the native shim's
    load_hdr (pinned there by test_native_abi.test_native_hdr_decode)."""
    w = 8
    data = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y 2 +X {w}\n".encode()
    # Row 0: new-style RLE runs; row 1: literals.
    data += bytes([2, 2, 0, w])
    for v in (128, 64, 0, 129):
        data += bytes([128 + w, v])
    data += bytes([2, 2, 0, w])
    for v in (200, 10, 255, 128):
        data += bytes([w]) + bytes([v]) * w
    p = tmp_path / "img.hdr"
    p.write_bytes(data)
    img = load_image(str(p))
    assert img.channels == Channels.rgb
    assert img.extent == Extent(w, 2)

    def ldr(c, e):
        if c == 0 or e == 0:
            return 0
        return int(np.clip((c * 2.0 ** (e - 136)) ** (1 / 2.2) * 255 + 0.5,
                           0, 255))

    np.testing.assert_array_equal(
        img.pixels[0, 0], [ldr(128, 129), ldr(64, 129), ldr(0, 129)])
    np.testing.assert_array_equal(
        img.pixels[1, 3], [ldr(200, 128), ldr(10, 128), ldr(255, 128)])


def test_load_truncated_hdr_raises(tmp_path):
    p = tmp_path / "bad.hdr"
    p.write_bytes(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y 4 +X 16\n\x02\x02")
    with pytest.raises(Exception, match="truncated|Failed"):
        load_image(str(p))


def _pic_header(w, h):
    import struct

    return (struct.pack(">I", 0x5380F634) + struct.pack(">f", 3.71)
            + b"c" * 80 + b"PICT" + struct.pack(">HH", w, h)
            + struct.pack(">f", 1.0) + struct.pack(">HH", 3, 0))


def test_load_pic(tmp_path):
    """Built-in Softimage PIC reader (no Pillow plugin exists): raw RGB,
    mixed-RLE RGB + raw alpha, and the BE16 long-run form — mirroring the
    native decoder's test vectors (test_native_abi.py) so both tiers pin
    the same semantics."""
    rng = np.random.default_rng(13)
    h, w = 4, 6
    arr = np.ascontiguousarray(rng.integers(0, 256, (h, w, 4),
                                            dtype=np.uint8))

    # Raw RGB (no alpha packet -> rgb).
    raw = _pic_header(w, h) + bytes([0, 8, 0, 0xE0])
    for y in range(h):
        raw += arr[y, :, :3].tobytes()
    p = tmp_path / "raw.pic"
    p.write_bytes(raw)
    img = load_image(str(p))
    assert img.channels == Channels.rgb
    np.testing.assert_array_equal(img.pixels, arr[:, :, :3])

    # Mixed-RLE RGB (one run + literals per row) + raw alpha -> rgba.
    arr[:, 1:4] = arr[:, 1:2]  # a 3-pixel run in every row
    rle = _pic_header(w, h) + bytes([1, 8, 2, 0xE0]) + bytes([0, 8, 0, 0x10])
    for y in range(h):
        row = (bytes([0]) + arr[y, 0, :3].tobytes()           # 1 literal
               + bytes([127 + 3]) + arr[y, 1, :3].tobytes()   # run of 3
               + bytes([1]) + arr[y, 4:6, :3].tobytes())      # 2 literals
        rle += row + arr[y, :, 3].tobytes()
    p = tmp_path / "rle.pic"
    p.write_bytes(rle)
    img = load_image(str(p))
    assert img.channels == Channels.rgba
    np.testing.assert_array_equal(img.pixels, arr)

    # Long-run form (count == 128 + BE16 length).
    wide = 300
    long_rle = (_pic_header(wide, 1) + bytes([0, 8, 2, 0xE0])
                + bytes([128]) + wide.to_bytes(2, "big") + bytes([9, 8, 7]))
    p = tmp_path / "long.pic"
    p.write_bytes(long_rle)
    img = load_image(str(p))
    assert img.extent == Extent(wide, 1)
    np.testing.assert_array_equal(img.pixels,
                                  np.tile([9, 8, 7], (1, wide, 1)))


def test_load_pic_pure_rle(tmp_path):
    """Packet type 1 (pure RLE: {count, pixel} pairs, end-of-scanline
    clamping like stb) — the third compression stb accepts."""
    w, h = 5, 2
    body = b""
    rows = [[(3, (1, 2, 3)), (9, (4, 5, 6))],   # 9 clamps to 2 remaining
            [(5, (7, 8, 9))]]
    for row in rows:
        for count, px in row:
            body += bytes([count]) + bytes(px)
    p = tmp_path / "pure.pic"
    p.write_bytes(_pic_header(w, h) + bytes([0, 8, 1, 0xE0]) + body)
    img = load_image(str(p))
    assert img.channels == Channels.rgb
    want = np.array([[[1, 2, 3]] * 3 + [[4, 5, 6]] * 2,
                     [[7, 8, 9]] * 5], np.uint8)
    np.testing.assert_array_equal(img.pixels, want)

    # Zero count = no progress -> rejected.
    p.write_bytes(_pic_header(w, 1) + bytes([0, 8, 1, 0xE0])
                  + bytes([0]) + bytes([1, 2, 3]))
    with pytest.raises(Exception, match="zero-length|Failed"):
        load_image(str(p))


def test_load_pic_dimension_cap(tmp_path):
    """A tiny file claiming a huge canvas is rejected before allocation."""
    import struct

    hdr = (struct.pack(">I", 0x5380F634) + struct.pack(">f", 3.71)
           + b"c" * 80 + b"PICT" + struct.pack(">HH", 32768, 32768)
           + struct.pack(">f", 1.0) + struct.pack(">HH", 3, 0))
    p = tmp_path / "huge.pic"
    p.write_bytes(hdr + bytes([0, 8, 0, 0xE0]))
    with pytest.raises(Exception, match="dimensions|Failed"):
        load_image(str(p))


def test_load_truncated_pic_raises(tmp_path):
    p = tmp_path / "bad.pic"
    p.write_bytes(_pic_header(6, 4) + bytes([0, 8, 0, 0xE0]) + b"\x01\x02")
    with pytest.raises(Exception, match="truncated|Failed"):
        load_image(str(p))
    # An RLE run past the scanline is rejected, not written out of bounds.
    p.write_bytes(_pic_header(2, 1) + bytes([0, 8, 2, 0xE0])
                  + bytes([127 + 5]) + b"\x01\x02\x03")
    with pytest.raises(Exception, match="past scanline|Failed"):
        load_image(str(p))
