"""Real-asset pipeline smoke: decode the reference's only real (non-LFS)
test image — /root/reference/test/input/truck.jpg, 1800x1200 JPEG — through
image/io.py and run the full public pipeline on it at small model size.

Counterpart of the reference's tier that runs on real files
(/root/reference/test/test_image.cpp:10-69 and test_segmentation.cpp), minus
golden comparison (goldens are LFS pointers here; numerical ground truth is
covered by the torch-oracle parity tests)."""

import os

import numpy as np
import pytest

import dlimgedit_tpu as dl
from dlimgedit_tpu.image.io import load_image, save_image

TRUCK = "/root/reference/test/input/truck.jpg"

pytestmark = pytest.mark.skipif(not os.path.exists(TRUCK),
                                reason="reference asset not present")


@pytest.fixture(scope="module")
def truck():
    return load_image(TRUCK)


@pytest.fixture(scope="module")
def env():
    return dl.Environment(dl.Options(backend=dl.Backend.cpu,
                                     allow_random_weights=True,
                                     compute_dtype="float32",
                                     sam_image_size=64))


def test_decode_real_jpeg(truck):
    assert truck.extent == dl.Extent(1800, 1200)
    assert truck.channels in (dl.Channels.rgb, dl.Channels.rgba)
    px = truck.pixels
    assert px.dtype == np.uint8
    # A real photograph: non-degenerate dynamic range and variance.
    assert px.min() == 0 and px.max() == 255
    assert px.std() > 10


def test_roundtrip_real_jpeg(truck, tmp_path):
    out = tmp_path / "truck_copy.png"
    save_image(truck.view(), str(out))
    back = load_image(str(out))
    assert back.extent == truck.extent
    # PNG is lossless: exact pixel round-trip of the decoded data.
    np.testing.assert_array_equal(
        np.asarray(back.pixels)[..., :3], np.asarray(truck.pixels)[..., :3])


def test_full_pipeline_on_real_image(truck, env):
    seg = dl.Segmentation.process(truck, env)
    assert seg.extent == truck.extent

    # Point, region and multi-mask queries — the full prompt protocol.
    m1 = seg.compute_mask(dl.Point(900, 600))
    assert m1.extent == truck.extent and m1.channels == dl.Channels.mask
    assert m1.pixels.dtype == np.uint8
    assert set(np.unique(m1.pixels)) <= {0, 255}

    m2 = seg.compute_mask(dl.Region(dl.Point(100, 100), dl.Point(1700, 1100)))
    assert m2.extent == truck.extent

    masks = seg.compute_masks(dl.Point(900, 600))
    assert len(masks) == 3
    assert all(m.image.extent == truck.extent for m in masks)
    # Reference protocol: the 3 mask tokens in order, each with a finite
    # confidence (NOT sorted — dlimgedit.hpp:155-158 returns them as-is).
    assert all(np.isfinite(m.accuracy) for m in masks)


def test_segment_objects_on_real_image(truck, env):
    import dlimgedit_tpu.runtime.birefnet as rb

    orig = dict(rb.BIREFNET_RESOLUTION)
    rb.BIREFNET_RESOLUTION["general"] = 64
    try:
        fg = dl.segment_objects(truck, env)
        assert fg.extent == truck.extent
        assert fg.channels == dl.Channels.mask
    finally:
        rb.BIREFNET_RESOLUTION.update(orig)
