"""End-to-end pipeline tests (random weights, small model resolution).

Mirrors the integration tier of the reference's test strategy
(test_segmentation.cpp SAM.segmentation[cpu]) minus golden-image comparison
(goldens are git-lfs pointers here; architecture parity is covered by
test_sam_parity.py). These tests exercise: Environment creation, lazy model
loading, fused preprocess -> encoder -> cached embedding, prompt building,
decoder -> fused postprocess -> host mask extraction, executable caching.
"""

import numpy as np
import pytest

from dlimgedit_tpu import (
    Backend,
    Channels,
    Environment,
    Extent,
    Image,
    Options,
    Point,
    Region,
    Segmentation,
    is_supported,
)
from dlimgedit_tpu.errors import DlimgError, ModelNotFoundError


@pytest.fixture(scope="module")
def env():
    return Environment(Options(
        backend=Backend.cpu,
        allow_random_weights=True,
        compute_dtype="float32",
        sam_image_size=128,  # small model resolution: fast CPU compile
    ))


@pytest.fixture(scope="module")
def seg(env):
    rng = np.random.default_rng(0)
    img = Image(Extent(96, 64), Channels.rgba,
                rng.integers(0, 256, (64, 96, 4), dtype=np.uint8))
    return Segmentation.process(img, env)


def test_is_supported_cpu():
    assert is_supported(Backend.cpu)


def test_missing_model_dir_raises():
    with pytest.raises(DlimgError):
        Environment(Options(model_directory="/nonexistent/path"))


def test_missing_bundle_raises(tmp_path):
    (tmp_path / "segmentation").mkdir()
    e = Environment(Options(model_directory=str(tmp_path)))
    with pytest.raises(ModelNotFoundError):
        e.sam_model("mobile_sam")


def test_process_embedding_shape(env, seg):
    assert seg.extent == Extent(96, 64)
    # 128/16 = 8 embedding grid, 256 channels, on device, f32.
    assert seg.embedding.shape == (1, 8, 8, 256)
    assert str(seg.embedding.dtype) == "float32"


def test_compute_mask_point(seg):
    mask = seg.compute_mask(Point(48, 30))
    assert mask.extent == Extent(96, 64)
    assert mask.channels == Channels.mask
    vals = np.unique(mask.pixels)
    assert set(vals.tolist()) <= {0, 255}


def test_compute_mask_region(seg):
    mask = seg.compute_mask(Region(Point(10, 10), Point(80, 50)))
    assert mask.extent == Extent(96, 64)
    assert set(np.unique(mask.pixels).tolist()) <= {0, 255}


def test_compute_mask_region_largest_component(seg):
    mask = seg.compute_mask(Region(Point(10, 10), Point(80, 50)),
                            largest_component=True)
    assert mask.extent == Extent(96, 64)


def test_compute_masks_multi(seg):
    masks = seg.compute_masks(Point(48, 30))
    assert len(masks) == 3
    for m in masks:
        assert m.image.extent == Extent(96, 64)
        assert isinstance(m.accuracy, float)


def test_executable_cache_reused(env, seg):
    # Same bucket + mode -> no new compile entries beyond the first call.
    n_before = len(env._executables)
    seg.compute_mask(Point(5, 5))
    seg.compute_mask(Point(90, 60))
    assert len(env._executables) == n_before


def test_different_image_sizes_share_bucket_executable(env):
    rng = np.random.default_rng(1)
    n_before = len(env._executables)
    for extent in (Extent(64, 48), Extent(100, 70), Extent(128, 128)):
        img = Image(extent, Channels.rgb,
                    rng.integers(0, 256, (extent.height, extent.width, 3),
                                 dtype=np.uint8))
        s = Segmentation.process(img, env)
        m = s.compute_mask(Point(10, 10))
        assert m.extent == extent
    # All three extents fall in the 128 bucket -> embed fn already cached.
    assert len(env._executables) == n_before


def test_mask_channel_protocol(seg):
    # Masks use Channels::mask with values 0 or 255 (dlimgedit.hpp:141).
    mask = seg.compute_mask(Point(48, 30))
    assert mask.pixels.shape == (64, 96, 1)


def test_compute_mask_batch_matches_individual(seg):
    from dlimgedit_tpu import Region

    prompts = [Point(48, 30), Point(20, 20), Region(Point(10, 10), Point(80, 50))]
    batch = seg.compute_mask_batch(prompts)
    assert len(batch) == 3
    for prompt, got in zip(prompts, batch):
        single = seg.compute_mask(prompt)
        np.testing.assert_array_equal(got.image.pixels, single.pixels)


def test_compute_mask_batch_empty(seg):
    assert seg.compute_mask_batch([]) == []


def test_host_preprocess_mode():
    """Options.preprocess_mode='host': stb-semantics resize on the host,
    identity device resample. Must equal the device path exactly when no
    resize is needed, and work end-to-end when one is."""
    env_h = Environment(Options(backend=Backend.cpu,
                                allow_random_weights=True,
                                compute_dtype="float32",
                                sam_image_size=128,
                                preprocess_mode="host"))
    env_d = Environment(Options(backend=Backend.cpu,
                                allow_random_weights=True,
                                compute_dtype="float32",
                                sam_image_size=128))
    rng = np.random.default_rng(7)
    # Exactly model-sized input: no resize, paths must agree bit-for-bit.
    img = Image(Extent(128, 128), Channels.rgb,
                rng.integers(0, 256, (128, 128, 3), dtype=np.uint8))
    mh = Segmentation.process(img, env_h).compute_mask(Point(64, 64))
    md = Segmentation.process(img, env_d).compute_mask(Point(64, 64))
    np.testing.assert_array_equal(mh.pixels, md.pixels)

    # Non-trivial resize: host path end-to-end.
    img2 = Image(Extent(200, 80), Channels.rgb,
                 rng.integers(0, 256, (80, 200, 3), dtype=np.uint8))
    seg = Segmentation.process(img2, env_h)
    mask = seg.compute_mask(Point(100, 40))
    assert mask.extent == Extent(200, 80)


def test_concurrent_mask_queries(env, seg):
    """Environment / Segmentation are safe to use from multiple threads
    (the reference documents Environment thread-safety, dlimgedit.hpp:101)."""
    import threading

    results = {}

    def worker(i):
        results[i] = seg.compute_mask(Point(10 + i * 7, 10 + i * 5))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    for i, m in results.items():
        np.testing.assert_array_equal(
            m.pixels, seg.compute_mask(Point(10 + i * 7, 10 + i * 5)).pixels)


def test_batch_region_honours_largest_region_object():
    """compute_mask_batch must apply Options.largest_region_object to its
    Region prompts exactly like compute_mask (regression: the batch decode
    silently skipped the largest-component filter), while Point prompts in
    the same batch stay raw."""
    env = Environment(Options(
        backend=Backend.cpu, allow_random_weights=True,
        compute_dtype="float32", sam_image_size=64,
        largest_region_object=True))
    rng = np.random.default_rng(3)
    img = Image(Extent(48, 40), Channels.rgb,
                rng.integers(0, 256, (40, 48, 3), dtype=np.uint8))
    seg = Segmentation.process(img, env)
    region = Region(Point(4, 4), Point(40, 32))
    point = Point(20, 20)
    batch = seg.compute_mask_batch([region, point])
    np.testing.assert_array_equal(batch[0].image.pixels,
                                  seg.compute_mask(region).pixels)
    np.testing.assert_array_equal(
        batch[1].image.pixels,
        seg.compute_mask(point, largest_component=False).pixels)


def test_host_mode_buckets_by_resized_extent():
    """Host preprocess mode stages the already-resized (<= sam_image_size)
    image, so the embed canvas must bucket by the RESIZED extent (regression:
    bucketing by the original staged a huge canvas and compiled an extra
    embed executable per original-size bucket)."""
    env = Environment(Options(
        backend=Backend.cpu, allow_random_weights=True,
        compute_dtype="float32", sam_image_size=64,
        preprocess_mode="host"))
    rng = np.random.default_rng(4)
    img = Image(Extent(300, 200), Channels.rgb,
                rng.integers(0, 256, (200, 300, 3), dtype=np.uint8))
    seg = Segmentation.process(img, env)
    embed_keys = [k for k in env._executables if k[0] == "embed"]
    assert embed_keys == [("embed", "mobile_sam", 256)], embed_keys
    mask = seg.compute_mask(Point(150, 100))
    assert (mask.extent.width, mask.extent.height) == (300, 200)


def test_serving_fetched_outputs_are_1d(env):
    """Serving layout rule (BENCH_NOTES round 3): outputs the native shim
    fetches raw through PJRT's ToHostBuffer must be 1-D — XLA assigns
    multi-dim outputs whose minor dim is under the 128-byte lane tile a
    transposed layout, and old plugins copy device order verbatim (every
    512-bucket packed mask came back byte-transposed before the decode
    builders flattened their packed output). Locks the contract on CPU via
    eval_shape so a reshape regression can't reach the exporter."""
    import jax

    from dlimgedit_tpu.runtime.segmentation import (
        _build_batch_decode_fn,
        _build_decode_fn,
    )

    bundle = env.sam_model("mobile_sam")
    g = bundle.cfg.image_size // 16
    emb = jax.ShapeDtypeStruct((1, g, g, 256), np.float32)
    pts = jax.ShapeDtypeStruct((1, 2, 2), np.float32)
    lbl = jax.ShapeDtypeStruct((1, 2), np.float32)
    sizes = jax.ShapeDtypeStruct((4,), np.int32)
    for multimask in (False, True):
        fn = _build_decode_fn(bundle, 128, multimask, False)
        packed, iou = jax.eval_shape(fn, bundle.params, emb, pts, lbl, sizes)
        assert packed.ndim == 1, packed.shape
        assert iou.ndim == 1
    bfn = _build_batch_decode_fn(bundle, 128)
    pts4 = jax.ShapeDtypeStruct((4, 2, 2), np.float32)
    lbl4 = jax.ShapeDtypeStruct((4, 2), np.float32)
    packed, iou = jax.eval_shape(bfn, bundle.params, emb, pts4, lbl4, sizes)
    assert packed.ndim == 1, packed.shape


def test_process_chunked_h2d_parity(env, seg):
    """Options.h2d_overlap_chunks > 1 (row-chunked pack+put pipeline) must
    produce the identical mask to the single-put baseline — the embed
    program re-joins the chunks on device before any compute."""
    env2 = Environment(Options(
        backend=Backend.cpu,
        allow_random_weights=True,
        compute_dtype="float32",
        sam_image_size=128,
        h2d_overlap_chunks=3,
    ))
    rng = np.random.default_rng(0)
    img = Image(Extent(96, 64), Channels.rgba,
                rng.integers(0, 256, (64, 96, 4), dtype=np.uint8))
    seg2 = Segmentation.process(img, env2)
    m1 = seg.compute_mask(Point(40, 30))
    m2 = seg2.compute_mask(Point(40, 30))
    np.testing.assert_array_equal(np.asarray(m1.pixels),
                                  np.asarray(m2.pixels))


def test_concurrent_chunked_process(env):
    """Concurrent process() calls on the chunked H2D path must be
    thread-safe (per-thread canvas pools, locked sizes cache) and produce
    the same masks as serial processing."""
    import threading

    env2 = Environment(Options(
        backend=Backend.cpu,
        allow_random_weights=True,
        compute_dtype="float32",
        sam_image_size=128,
        h2d_overlap_chunks=2,
    ))
    rng = np.random.default_rng(5)
    imgs = [Image(Extent(90 + i, 60 + i), Channels.rgb,
                  rng.integers(0, 256, (60 + i, 90 + i, 3), dtype=np.uint8))
            for i in range(4)]
    serial = [Segmentation.process(im, env2).compute_mask(Point(30, 20))
              for im in imgs]
    results = {}

    def worker(i):
        seg = Segmentation.process(imgs[i], env2)
        results[i] = seg.compute_mask(Point(30, 20))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        np.testing.assert_array_equal(results[i].pixels, serial[i].pixels)
