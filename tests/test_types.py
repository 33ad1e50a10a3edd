import numpy as np
import pytest

from dlimgedit_tpu.types import (
    Backend,
    Channels,
    Extent,
    Image,
    ImageView,
    Point,
    Region,
    channel_count,
)


def test_channel_count():
    assert channel_count(Channels.mask) == 1
    assert channel_count(Channels.rgb) == 3
    assert channel_count(Channels.rgba) == 4
    assert channel_count(Channels.bgra) == 4
    assert channel_count(Channels.argb) == 4


def test_image_alloc():
    img = Image(Extent(8, 6), Channels.rgba)
    assert img.pixels.shape == (6, 8, 4)
    assert img.size == 8 * 6 * 4


def test_image_view_from_array():
    arr = np.zeros((6, 8, 3), dtype=np.uint8)
    v = ImageView.from_array(arr)
    assert v.channels == Channels.rgb
    assert v.extent == Extent(8, 6)
    with pytest.raises(ValueError):
        ImageView.from_array(np.zeros((6, 8, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        ImageView.from_array(np.zeros((6, 8, 3), dtype=np.float32))


def test_region_from_origin_extent():
    # Mirrors Region(Point origin, Extent extent) (dlimgedit.hpp:131).
    r = Region.from_origin_extent(Point(180, 110), Extent(325, 220))
    assert r.bottom_right == Point(505, 330)
    assert r.extent == Extent(325, 220)


def test_backend_alias():
    assert Backend.gpu is Backend.tpu


def test_image_rejects_non_uint8_pixels():
    """A silent uint8 cast wrapped int16 values and floored float masks to
    zero; Image must reject like ImageView.from_array does."""
    import pytest

    with pytest.raises(ValueError, match="uint8"):
        Image(Extent(2, 2), Channels.mask, np.full((2, 2, 1), 0.99,
                                                   np.float32))


def test_image_save_instance_spelling(tmp_path):
    """Both img.save(path) and Image.save(img, path) must work."""
    rng = np.random.default_rng(0)
    img = Image(Extent(4, 4), Channels.rgb,
                rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))
    p1, p2 = tmp_path / "a.png", tmp_path / "b.png"
    img.save(p1)
    Image.save(img, p2)
    np.testing.assert_array_equal(Image.load(p1).pixels,
                                  Image.load(p2).pixels)
