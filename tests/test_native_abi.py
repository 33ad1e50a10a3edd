"""C ABI tests: load libdlimgedit_tpu.so via ctypes and exercise the full
dlimg_Api table — the rebuild's equivalent of running the reference's C++
test suite against the library (SURVEY.md §7 step 5).

The shim detects the already-running interpreter (the pytest process) and
uses it instead of spawning one, so these tests cover the exact marshalling
paths the standalone C++ embedder uses.
"""

import ctypes
import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SO_PATH = REPO / "native" / "build" / "libdlimgedit_tpu.so"


class DlimgImageView(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("channels", ctypes.c_int), ("stride", ctypes.c_int),
                ("pixels", ctypes.POINTER(ctypes.c_uint8))]


class DlimgOptions(ctypes.Structure):
    _fields_ = [("backend", ctypes.c_int),
                ("model_directory", ctypes.c_char_p)]


class DlimgApi(ctypes.Structure):
    _fields_ = [
        ("is_backend_supported", ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_int)),
        ("create_environment", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(DlimgOptions))),
        ("destroy_environment", ctypes.CFUNCTYPE(None, ctypes.c_void_p)),
        ("process_image_for_segmentation", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(DlimgImageView), ctypes.c_void_p)),
        ("get_segmentation_mask", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_float))),
        ("get_segmentation_extent", ctypes.CFUNCTYPE(
            None, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int))),
        ("destroy_segmentation", ctypes.CFUNCTYPE(None, ctypes.c_void_p)),
        ("segment_objects", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.POINTER(DlimgImageView),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_void_p)),
        ("load_image", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)))),
        ("save_image", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.POINTER(DlimgImageView), ctypes.c_char_p)),
        ("create_image", ctypes.CFUNCTYPE(
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int)),
        ("destroy_image", ctypes.CFUNCTYPE(
            None, ctypes.POINTER(ctypes.c_uint8))),
        ("last_error", ctypes.CFUNCTYPE(ctypes.c_char_p)),
        # Extensions appended past the reference-compatible 13-entry prefix.
        ("generate_masks", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int))),
        ("compute_mask_batch", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_float))),
    ]


@pytest.fixture(scope="module")
def api():
    from _native_build import ensure_native_build

    ensure_native_build(SO_PATH)
    os.environ["DLIMG_ALLOW_RANDOM_WEIGHTS"] = "1"
    os.environ["DLIMG_SAM_IMAGE_SIZE"] = "128"
    os.environ["DLIMG_COMPUTE_DTYPE"] = "float32"
    lib = ctypes.CDLL(str(SO_PATH))
    lib.dlimg_init.restype = ctypes.POINTER(DlimgApi)
    return lib.dlimg_init().contents


@pytest.fixture(scope="module")
def env(api):
    opts = DlimgOptions(backend=0, model_directory=b"models")
    handle = ctypes.c_void_p()
    rc = api.create_environment(ctypes.byref(handle), ctypes.byref(opts))
    assert rc == 0, api.last_error().decode()
    yield handle
    api.destroy_environment(handle)


def _view(arr: np.ndarray, channels: int) -> DlimgImageView:
    h, w = arr.shape[:2]
    return DlimgImageView(
        width=w, height=h, channels=channels, stride=0,
        pixels=arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))


def test_backend_supported(api):
    assert api.is_backend_supported(0) == 1  # cpu always


def test_create_environment_error_path(api):
    opts = DlimgOptions(backend=0, model_directory=b"/nonexistent/xyz")
    os.environ["DLIMG_ALLOW_RANDOM_WEIGHTS"] = "0"
    try:
        handle = ctypes.c_void_p()
        rc = api.create_environment(ctypes.byref(handle), ctypes.byref(opts))
        assert rc == 1
        assert b"not exist" in api.last_error() or api.last_error()
    finally:
        os.environ["DLIMG_ALLOW_RANDOM_WEIGHTS"] = "1"


def test_segmentation_roundtrip(api, env):
    rng = np.random.default_rng(0)
    arr = np.ascontiguousarray(
        rng.integers(0, 256, (48, 64, 4), dtype=np.uint8))
    seg = ctypes.c_void_p()
    view = _view(arr, 4)
    rc = api.process_image_for_segmentation(ctypes.byref(seg),
                                            ctypes.byref(view), env)
    assert rc == 0, api.last_error().decode()

    extent = (ctypes.c_int * 2)()
    api.get_segmentation_extent(seg, extent)
    assert (extent[0], extent[1]) == (64, 48)

    # Single mask from a point prompt.
    mask = np.zeros(48 * 64, np.uint8)
    out_masks = (ctypes.POINTER(ctypes.c_uint8) * 3)(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), None, None)
    acc = (ctypes.c_float * 3)()
    point = (ctypes.c_int * 2)(32, 24)
    rc = api.get_segmentation_mask(seg, point, None, out_masks, acc)
    assert rc == 0, api.last_error().decode()
    assert set(np.unique(mask)) <= {0, 255}

    # Region prompt.
    region = (ctypes.c_int * 4)(5, 5, 60, 40)
    rc = api.get_segmentation_mask(seg, None, region, out_masks, acc)
    assert rc == 0, api.last_error().decode()

    # Multi-mask: 3 buffers + accuracies.
    bufs = [np.zeros(48 * 64, np.uint8) for _ in range(3)]
    out3 = (ctypes.POINTER(ctypes.c_uint8) * 3)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs])
    rc = api.get_segmentation_mask(seg, point, None, out3, acc)
    assert rc == 0, api.last_error().decode()
    api.destroy_segmentation(seg)


def test_generate_masks_abi(api, env):
    """The appended generate_masks entry: embedded-Python route, parity vs
    the Python API (same executable family, same random weights)."""
    rng = np.random.default_rng(3)
    arr = np.ascontiguousarray(
        rng.integers(0, 256, (48, 64, 4), dtype=np.uint8))
    seg = ctypes.c_void_p()
    view = _view(arr, 4)
    rc = api.process_image_for_segmentation(ctypes.byref(seg),
                                            ctypes.byref(view), env)
    assert rc == 0, api.last_error().decode()
    os.environ["DLIMG_AMG_GRID"] = "4"  # tiny grid: fast CPU compile
    try:
        K = 4
        thr = (ctypes.c_float * 3)(0.0, 0.0, 0.7)
        bufs = [np.zeros(48 * 64, np.uint8) for _ in range(K)]
        ptrs = (ctypes.POINTER(ctypes.c_uint8) * K)(
            *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
              for b in bufs])
        acc = (ctypes.c_float * K)()
        count = ctypes.c_int(-1)
        rc = api.generate_masks(seg, thr, K, ptrs, acc, ctypes.byref(count))
        assert rc == 0, api.last_error().decode()
        assert 1 <= count.value <= K
        accs = [acc[i] for i in range(count.value)]
        assert accs == sorted(accs, reverse=True)
        for i in range(count.value):
            assert set(np.unique(bufs[i])) <= {0, 255}
            assert bufs[i].any()
        # Invalid args surface as errors, not crashes.
        rc = api.generate_masks(seg, thr, 0, ptrs, acc, ctypes.byref(count))
        assert rc == 1
        rc = api.generate_masks(None, thr, K, ptrs, acc, ctypes.byref(count))
        assert rc == 1
    finally:
        os.environ.pop("DLIMG_AMG_GRID", None)
        api.destroy_segmentation(seg)


def test_compute_mask_batch_abi(api, env):
    """The appended compute_mask_batch entry: a mixed point/box batch
    through one device program matches per-prompt get_segmentation_mask
    (the Python layer pins batch-vs-individual parity in
    test_segmentation.py; this covers the C marshalling on top)."""
    rng = np.random.default_rng(7)
    arr = np.ascontiguousarray(
        rng.integers(0, 256, (48, 64, 4), dtype=np.uint8))
    seg = ctypes.c_void_p()
    view = _view(arr, 4)
    rc = api.process_image_for_segmentation(ctypes.byref(seg),
                                            ctypes.byref(view), env)
    assert rc == 0, api.last_error().decode()
    try:
        prompts = [(32, 24, 0, 0), (10, 10, 0, 0), (5, 5, 60, 40)]
        is_region = [0, 0, 1]
        n = len(prompts)
        flat = (ctypes.c_int * (4 * n))(*[v for p in prompts for v in p])
        reg = (ctypes.c_int * n)(*is_region)
        bufs = [np.zeros(48 * 64, np.uint8) for _ in range(n)]
        ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
            *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
              for b in bufs])
        acc = (ctypes.c_float * n)()
        rc = api.compute_mask_batch(seg, flat, reg, n, ptrs, acc)
        assert rc == 0, api.last_error().decode()

        # Per-prompt oracle through the single-mask entry.
        for i in range(n):
            single = np.zeros(48 * 64, np.uint8)
            out1 = (ctypes.POINTER(ctypes.c_uint8) * 3)(
                single.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                None, None)
            a1 = (ctypes.c_float * 3)()
            if is_region[i]:
                region = (ctypes.c_int * 4)(*prompts[i])
                rc = api.get_segmentation_mask(seg, None, region, out1, a1)
            else:
                point = (ctypes.c_int * 2)(*prompts[i][:2])
                rc = api.get_segmentation_mask(seg, point, None, out1, a1)
            assert rc == 0, api.last_error().decode()
            np.testing.assert_array_equal(bufs[i], single)

        # Invalid args surface as errors, not crashes.
        assert api.compute_mask_batch(seg, flat, reg, 0, ptrs, acc) == 1
        assert api.compute_mask_batch(None, flat, reg, n, ptrs, acc) == 1
        assert api.compute_mask_batch(seg, None, reg, n, ptrs, acc) == 1
    finally:
        api.destroy_segmentation(seg)


def test_image_codecs_roundtrip(api, tmp_path):
    rng = np.random.default_rng(1)
    arr = np.ascontiguousarray(rng.integers(0, 256, (10, 12, 3),
                                            dtype=np.uint8))
    path = str(tmp_path / "roundtrip.png").encode()
    rc = api.save_image(ctypes.byref(_view(arr, 3)), path)
    assert rc == 0, api.last_error().decode()

    extent = (ctypes.c_int * 2)()
    channels = ctypes.c_int()
    pixels = ctypes.POINTER(ctypes.c_uint8)()
    rc = api.load_image(path, extent, ctypes.byref(channels),
                        ctypes.byref(pixels))
    assert rc == 0, api.last_error().decode()
    assert (extent[0], extent[1], channels.value) == (12, 10, 3)
    loaded = np.ctypeslib.as_array(pixels, shape=(10, 12, 3))
    np.testing.assert_array_equal(loaded, arr)
    api.destroy_image(pixels)

    rc = api.load_image(b"/nonexistent.png", extent, ctypes.byref(channels),
                        ctypes.byref(pixels))
    assert rc == 1


def _native_load(api, path: bytes):
    extent = (ctypes.c_int * 2)()
    channels = ctypes.c_int()
    pixels = ctypes.POINTER(ctypes.c_uint8)()
    rc = api.load_image(path, extent, ctypes.byref(channels),
                        ctypes.byref(pixels))
    assert rc == 0, api.last_error().decode()
    arr = np.ctypeslib.as_array(
        pixels, shape=(extent[1], extent[0], channels.value)).copy()
    api.destroy_image(pixels)
    return arr


def test_native_jpeg_decode_matches_pillow(api):
    """Native libjpeg decode vs the Python tier's Pillow decode on the real
    truck.jpg: both are libjpeg-turbo, so within 1 LSB everywhere."""
    import os

    truck = "/root/reference/test/input/truck.jpg"
    if not os.path.exists(truck):
        pytest.skip("reference asset not present")
    from dlimgedit_tpu.image.io import load_image

    ref = load_image(truck).pixels
    mine = _native_load(api, truck.encode())
    assert mine.shape == ref.shape
    assert np.abs(mine.astype(np.int16) - ref.astype(np.int16)).max() <= 1


@pytest.mark.parametrize("fmt,channels", [("BMP", 3), ("TGA", 3),
                                          ("TGA", 4), ("BMP", 1),
                                          ("TGA", 1)])
def test_native_bmp_tga_decode(api, tmp_path, fmt, channels):
    """Built-in BMP/TGA readers vs Pillow's encoders (exact: both formats
    are lossless containers)."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(channels)
    arr = np.ascontiguousarray(
        rng.integers(0, 256, (9, 11, channels), dtype=np.uint8))
    mode = {1: "L", 3: "RGB", 4: "RGBA"}[channels]
    path = tmp_path / f"img.{fmt.lower()}"
    PILImage.fromarray(arr if channels > 1 else arr[:, :, 0],
                       mode=mode).save(path, format=fmt)
    mine = _native_load(api, str(path).encode())
    np.testing.assert_array_equal(mine, arr)


def test_native_gray_trns_png_promotes_to_rgba(api, tmp_path):
    """A grayscale PNG with a tRNS chunk becomes gray+alpha (2ch) inside
    libpng after tRNS_to_alpha; the loader must promote it to RGBA to stay
    in the {1,3,4} contract instead of erroring (regression: only
    GRAY_ALPHA files were promoted)."""
    from PIL import Image as PILImage

    g = np.ascontiguousarray((np.arange(64, dtype=np.uint8) * 3)
                             .reshape(8, 8))
    p = tmp_path / "gray_trns.png"
    PILImage.fromarray(g, mode="L").save(p, transparency=99)
    mine = _native_load(api, str(p).encode())
    assert mine.shape == (8, 8, 4)
    for ch in range(3):
        np.testing.assert_array_equal(mine[:, :, ch], g)
    np.testing.assert_array_equal(mine[:, :, 3],
                                  np.where(g == 99, 0, 255))


def test_native_cmyk_jpeg_decodes_to_rgb(api, tmp_path):
    """CMYK/Adobe-YCCK JPEGs must come back as 3-channel RGB (regression:
    libjpeg's raw 4-component CMYK was passed through and misread as RGBA).
    Pillow applies the same Adobe-inverted c*k/255 conversion, so the two
    decodes agree exactly."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(7)
    arr = np.ascontiguousarray(rng.integers(0, 256, (16, 16, 4),
                                            dtype=np.uint8))
    p = tmp_path / "cmyk.jpg"
    PILImage.fromarray(arr, mode="CMYK").save(p, quality=95)
    mine = _native_load(api, str(p).encode())
    assert mine.shape == (16, 16, 3)
    ref = np.asarray(PILImage.open(p).convert("RGB"))
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.parametrize("channels", [1, 3])
def test_native_pnm_decode_matches_pillow(api, tmp_path, channels):
    """Built-in binary PGM/PPM reader vs Pillow's encoder (lossless)."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(channels)
    arr = np.ascontiguousarray(
        rng.integers(0, 256, (7, 9, channels), dtype=np.uint8))
    path = tmp_path / ("img.pgm" if channels == 1 else "img.ppm")
    PILImage.fromarray(arr if channels > 1 else arr[:, :, 0]).save(path)
    mine = _native_load(api, str(path).encode())
    np.testing.assert_array_equal(mine, arr)


def test_native_gif_decode_matches_pillow(api, tmp_path):
    """Built-in GIF reader (first frame, RGBA like stbi_load) vs Pillow
    decoding the same palettized file."""
    from PIL import Image as PILImage

    rng = np.random.default_rng(3)
    # Palette-limited content so GIF quantization is exact.
    arr = (rng.integers(0, 4, (12, 10), dtype=np.uint8) * 80)
    rgb = np.stack([arr, 255 - arr, arr // 2], axis=-1)
    path = tmp_path / "img.gif"
    PILImage.fromarray(rgb).save(path)
    mine = _native_load(api, str(path).encode())
    ref = np.asarray(PILImage.open(path).convert("RGBA"))
    assert mine.shape == ref.shape == (12, 10, 4)
    np.testing.assert_array_equal(mine, ref)


def test_native_gif_transparency(api, tmp_path):
    """Transparent palette index -> alpha 0 over the cleared canvas (the
    stb first-frame convention)."""
    from PIL import Image as PILImage

    idx = np.zeros((6, 6), np.uint8)
    idx[2:4, 2:4] = 1
    pal_img = PILImage.fromarray(idx, mode="P")
    pal_img.putpalette([10, 20, 30, 200, 150, 100] + [0] * (254 * 3))
    path = tmp_path / "transparent.gif"
    pal_img.save(path, transparency=1)
    mine = _native_load(api, str(path).encode())
    assert mine.shape == (6, 6, 4)
    inner = mine[2:4, 2:4]
    np.testing.assert_array_equal(inner[..., 3], 0)
    outer_alpha = mine[..., 3].copy()
    outer_alpha[2:4, 2:4] = 255
    np.testing.assert_array_equal(outer_alpha, 255)
    np.testing.assert_array_equal(mine[0, 0], [10, 20, 30, 255])


def test_native_psd_decode_matches_pillow(api, tmp_path):
    """Built-in PSD reader (RGB composite, raw + RLE) vs Pillow reading the
    same handcrafted files. Always RGBA (alpha 255 when absent), like stb."""
    import struct

    from PIL import Image as PILImage

    rng = np.random.default_rng(11)
    arr = np.ascontiguousarray(rng.integers(0, 256, (5, 6, 3),
                                            dtype=np.uint8))
    h, w = arr.shape[:2]

    def psd_bytes(compression):
        head = b"8BPS" + struct.pack(">H6xHIIHH", 1, 3, h, w, 8, 3)
        head += struct.pack(">I", 0) * 3  # empty sections
        planes = [arr[:, :, c].tobytes() for c in range(3)]
        if compression == 0:
            return head + struct.pack(">H", 0) + b"".join(planes)
        # RLE: all-literal PackBits rows (w <= 128).
        rows, table = [], []
        for c in range(3):
            for y in range(h):
                row = bytes([w - 1]) + arr[y, :, c].tobytes()
                rows.append(row)
                table.append(struct.pack(">H", len(row)))
        return (head + struct.pack(">H", 1) + b"".join(table)
                + b"".join(rows))

    for compression in (0, 1):
        path = tmp_path / f"img_{compression}.psd"
        path.write_bytes(psd_bytes(compression))
        mine = _native_load(api, str(path).encode())
        assert mine.shape == (h, w, 4)
        np.testing.assert_array_equal(mine[:, :, :3], arr)
        np.testing.assert_array_equal(mine[:, :, 3], 255)
        ref = np.asarray(PILImage.open(path).convert("RGB"))
        np.testing.assert_array_equal(mine[:, :, :3], ref)


def test_native_pic_decode(api, tmp_path):
    """Built-in Softimage PIC reader: uncompressed and mixed-RLE packets,
    RGB and RGB+A layouts, against handcrafted spec-conformant files
    (the one stb container the codec layer previously omitted)."""
    import struct

    rng = np.random.default_rng(13)
    h, w = 4, 6
    arr = np.ascontiguousarray(rng.integers(0, 256, (h, w, 4),
                                            dtype=np.uint8))
    # Force an RLE-friendly run in row 0: identical pixels 1..4.
    arr[0, 1:5] = arr[0, 1]

    def header():
        return (struct.pack(">I", 0x5380F634) + struct.pack(">f", 3.71)
                + b"c" * 80 + b"PICT" + struct.pack(">HH", w, h)
                + struct.pack(">f", 1.0) + struct.pack(">HH", 3, 0))

    def packet(chained, ptype, mask):
        return bytes([1 if chained else 0, 8, ptype, mask])

    def rle_row(row):  # mixed RLE: runs >= 2 as 127+len, literals batched
        out = b""
        x = 0
        while x < len(row):
            run = 1
            while (x + run < len(row)
                   and np.array_equal(row[x + run], row[x])
                   and run < 127):
                run += 1
            if run >= 2:
                out += bytes([127 + run]) + row[x].tobytes()
                x += run
            else:
                lit = x + 1
                while lit < len(row):
                    nxt = 1
                    while (lit + nxt < len(row)
                           and np.array_equal(row[lit + nxt], row[lit])):
                        nxt += 1
                    if nxt >= 2:
                        break
                    lit += 1
                out += bytes([lit - x - 1]) + row[x:lit].tobytes()
                x = lit
        return out

    # Uncompressed RGB (alpha packet absent -> 3 channels out).
    raw = header() + packet(False, 0, 0xE0)
    for y in range(h):
        raw += arr[y, :, :3].tobytes()
    p = tmp_path / "raw.pic"
    p.write_bytes(raw)
    mine = _native_load(api, str(p).encode())
    assert mine.shape == (h, w, 3)
    np.testing.assert_array_equal(mine, arr[:, :, :3])

    # Mixed-RLE RGB packet + uncompressed alpha packet (-> 4 channels).
    rle = header() + packet(True, 2, 0xE0) + packet(False, 0, 0x10)
    for y in range(h):
        rle += rle_row(arr[y, :, :3]) + arr[y, :, 3].tobytes()
    p = tmp_path / "rle.pic"
    p.write_bytes(rle)
    mine = _native_load(api, str(p).encode())
    assert mine.shape == (h, w, 4)
    np.testing.assert_array_equal(mine, arr)

    # Long-run form (count == 128 + BE16 length) on a constant row.
    wide = 300
    row = np.full((wide, 3), 42, np.uint8)
    long_rle = (header()[:92] + struct.pack(">HH", wide, 1)
                + struct.pack(">f", 1.0) + struct.pack(">HH", 3, 0)
                + packet(False, 2, 0xE0)
                + bytes([128]) + struct.pack(">H", wide) + row[0].tobytes())
    p = tmp_path / "long.pic"
    p.write_bytes(long_rle)
    mine = _native_load(api, str(p).encode())
    assert mine.shape == (1, wide, 3)
    np.testing.assert_array_equal(mine, row[None])

    # Pure RLE (type 1): {count, pixel} pairs with stb's end-of-scanline
    # clamping.
    pure = header() + packet(False, 1, 0xE0)
    for y in range(h):
        pure += (bytes([2]) + arr[y, 0, :3].tobytes()       # run of 2
                 + bytes([200]) + arr[y, 2, :3].tobytes())  # clamps to 4
    p = tmp_path / "pure.pic"
    p.write_bytes(pure)
    mine = _native_load(api, str(p).encode())
    assert mine.shape == (h, w, 3)
    want = arr[:, :, :3].copy()
    want[:, 1] = want[:, 0]
    want[:, 3:] = want[:, 2:3]
    np.testing.assert_array_equal(mine, want)

    # Corrupt inputs error (no crash): truncated pixels, overrunning run,
    # zero-length pure-RLE run, huge claimed dimensions.
    import struct as _st
    huge = (_st.pack(">I", 0x5380F634) + _st.pack(">f", 3.71) + b"c" * 80
            + b"PICT" + _st.pack(">HH", 32768, 32768)
            + _st.pack(">f", 1.0) + _st.pack(">HH", 3, 0)
            + packet(False, 0, 0xE0))
    for bad in (raw[:-5], header() + packet(False, 2, 0xE0)
                + bytes([127 + w + 1]) + b"\x01\x02\x03",
                header() + packet(False, 1, 0xE0) + bytes([0, 1, 2, 3]),
                huge):
        p = tmp_path / "bad.pic"
        p.write_bytes(bad)
        extent = (ctypes.c_int * 2)()
        channels = ctypes.c_int()
        pixels = ctypes.POINTER(ctypes.c_uint8)()
        rc = api.load_image(str(p).encode(), extent,
                            ctypes.byref(channels), ctypes.byref(pixels))
        assert rc == 1
        assert b"pic:" in api.last_error()


def test_native_hdr_decode(api, tmp_path):
    """Built-in Radiance HDR reader: RGBE -> stb's LDR conversion
    (c * 2^(e-136), gamma 2.2, scale 1), new-style RLE scanlines."""
    path = tmp_path / "img.hdr"
    w = 8
    rgbe_r, rgbe_g, rgbe_b, rgbe_e = 128, 64, 0, 129
    data = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y 1 +X {w}\n".encode()
    data += bytes([2, 2, 0, w])  # new-style RLE header
    for v in (rgbe_r, rgbe_g, rgbe_b, rgbe_e):
        data += bytes([128 + w, v])  # one run per plane
    path.write_bytes(data)
    mine = _native_load(api, str(path).encode())
    assert mine.shape == (1, w, 3)

    def ldr(c, e):
        if c == 0 or e == 0:
            return 0
        v = c * 2.0 ** (e - 136)
        return int(np.clip(v ** (1 / 2.2) * 255 + 0.5, 0, 255))

    want = [ldr(rgbe_r, rgbe_e), ldr(rgbe_g, rgbe_e), ldr(rgbe_b, rgbe_e)]
    np.testing.assert_array_equal(mine[0, 0], want)
    np.testing.assert_array_equal(mine, np.tile(want, (1, w, 1)))


def test_create_destroy_image(api):
    p = api.create_image(8, 6, 4)
    assert p
    api.destroy_image(p)


def test_segment_objects_abi(api, env):
    os.environ["DLIMG_BIREFNET_RESOLUTION"] = "64"
    try:
        rng = np.random.default_rng(3)
        arr = np.ascontiguousarray(
            rng.integers(0, 256, (40, 56, 3), dtype=np.uint8))
        out = np.zeros(40 * 56, np.uint8)
        view = _view(arr, 3)
        rc = api.segment_objects(
            ctypes.byref(view),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), env)
        assert rc == 0, api.last_error().decode()
        assert out.min() >= 0 and out.max() <= 255
    finally:
        os.environ.pop("DLIMG_BIREFNET_RESOLUTION", None)


def test_hostile_arguments_error_not_crash(api, env, tmp_path):
    """Hostile/degenerate arguments must yield dlimg_error + a message (or a
    clamped success), never abort the host — the round-3 exception-trapping
    contract, pinned here at the ctypes level (the reference inherits this
    from its C++ test tier, test_segmentation.cpp error scenarios)."""
    # 0x0 image.
    empty = np.zeros((1, 1, 3), np.uint8)  # valid buffer, lying extents
    view = DlimgImageView(width=0, height=0, channels=3, stride=0,
                          pixels=empty.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_uint8)))
    seg = ctypes.c_void_p()
    rc = api.process_image_for_segmentation(ctypes.byref(seg),
                                            ctypes.byref(view), env)
    assert rc == 1 and api.last_error()

    # Unsupported channel count (2 = gray+alpha is not a dlimg format).
    arr2 = np.zeros((8, 8, 2), np.uint8)
    rc = api.process_image_for_segmentation(
        ctypes.byref(seg), ctypes.byref(_view(arr2, 2)), env)
    assert rc == 1 and api.last_error()

    # Out-of-range point prompt on a real segmentation: clamped success or
    # a clean error are both acceptable; a crash is not.
    rng = np.random.default_rng(7)
    arr = np.ascontiguousarray(rng.integers(0, 256, (32, 32, 3),
                                            dtype=np.uint8))
    rc = api.process_image_for_segmentation(
        ctypes.byref(seg), ctypes.byref(_view(arr, 3)), env)
    assert rc == 0, api.last_error().decode()
    mask = np.zeros(32 * 32, np.uint8)
    out_masks = (ctypes.POINTER(ctypes.c_uint8) * 3)(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), None, None)
    acc = (ctypes.c_float * 3)()
    for px, py in [(-5, -5), (10_000, 10_000)]:
        point = (ctypes.c_int * 2)(px, py)
        rc = api.get_segmentation_mask(seg, point, None, out_masks, acc)
        assert rc in (0, 1)
        if rc == 1:
            assert api.last_error()
    # Degenerate (inverted) region prompt.
    region = (ctypes.c_int * 4)(20, 20, 4, 4)
    rc = api.get_segmentation_mask(seg, None, region, out_masks, acc)
    assert rc in (0, 1)
    api.destroy_segmentation(seg)

    # Codec error paths: directory as image, unwritable save target.
    extent = (ctypes.c_int * 2)()
    channels = ctypes.c_int()
    px = ctypes.POINTER(ctypes.c_uint8)()
    rc = api.load_image(str(tmp_path).encode(), extent,
                        ctypes.byref(channels), ctypes.byref(px))
    assert rc == 1 and api.last_error()
    rc = api.save_image(ctypes.byref(_view(arr, 3)),
                        b"/nonexistent-dir/out.png")
    assert rc == 1 and api.last_error()


def test_abi_concurrent_queries(api, env):
    """Concurrent C ABI calls from multiple host threads: ctypes releases
    the GIL during the foreign call, so this drives the shim's GIL
    re-acquisition (Gil in capi.cpp) and the thread_local staging canvases
    under real contention — the reference documents Environment
    thread-safety (dlimgedit.hpp:101) and this is the C-level analog of
    test_segmentation.py's Python-level test."""
    import threading

    rng = np.random.default_rng(11)
    errs = []

    def worker(i):
        try:
            arr = np.ascontiguousarray(
                rng.integers(0, 256, (24 + i, 32, 3), dtype=np.uint8))
            seg = ctypes.c_void_p()
            rc = api.process_image_for_segmentation(
                ctypes.byref(seg), ctypes.byref(_view(arr, 3)), env)
            assert rc == 0, api.last_error().decode()
            mask = np.zeros((24 + i) * 32, np.uint8)
            out = (ctypes.POINTER(ctypes.c_uint8) * 3)(
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                None, None)
            acc = (ctypes.c_float * 3)()
            point = (ctypes.c_int * 2)(16, 12)
            rc = api.get_segmentation_mask(seg, point, None, out, acc)
            assert rc == 0, api.last_error().decode()
            api.destroy_segmentation(seg)
        except Exception as e:  # surfaced after join
            errs.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
