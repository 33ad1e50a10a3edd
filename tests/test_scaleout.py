"""Options.scaleout_devices: the latency scale-out tiers routed through the
PUBLIC runtime surface (Environment / Segmentation / segment_objects).

parallel/sp.py and parallel/spatial.py prove the tiers in isolation;
these tests prove a serving deployment reaches them by flipping ONE
option — parity vs the single-device path on the virtual 8-device CPU
mesh (conftest), with the mesh fallback rules pinned (fewer than 2
devices -> plain single-device path, so `scaleout_devices=0` is always
safe to set)."""

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
    Segmentation,
    segment_objects,
)


def _opts(**kw):
    base = dict(backend=Backend.cpu, allow_random_weights=True,
                compute_dtype="float32", sam_image_size=128)
    base.update(kw)
    return Options(**base)


def _image(w=96, h=64, seed=0, channels=Channels.rgba):
    rng = np.random.default_rng(seed)
    n = {Channels.rgba: 4, Channels.rgb: 3}[channels]
    return Image(Extent(w, h), channels,
                 rng.integers(0, 256, (h, w, n), dtype=np.uint8))


def test_mesh_construction_rules():
    # 0 = all devices of the backend (conftest forces 8 virtual CPUs).
    env = Environment(_opts(scaleout_devices=0))
    assert env.mesh is not None and env.mesh.shape["sp"] == 8
    assert env.put_target != env.device  # replicated NamedSharding
    # 1 (default) = off.
    assert Environment(_opts()).mesh is None
    # N = that many, clamped to what exists.
    assert Environment(_opts(scaleout_devices=4)).mesh.shape["sp"] == 4
    assert Environment(_opts(scaleout_devices=99)).mesh.shape["sp"] == 8


def test_tinyvit_process_parity_and_mask():
    """mobile_sam routes through GSPMD canvas-row sharding; the embedding
    must match the single-device program (f32 collective reassociation
    only) and the decoded mask must be byte-identical."""
    img = _image()
    env1 = Environment(_opts())
    env8 = Environment(_opts(scaleout_devices=0))
    seg1 = Segmentation.process(img, env1)
    seg8 = Segmentation.process(img, env8)
    np.testing.assert_allclose(np.asarray(seg8.embedding),
                               np.asarray(seg1.embedding),
                               atol=2e-4, rtol=1e-4)
    m1 = np.asarray(seg1.compute_mask(Point(20, 20)).pixels)
    m8 = np.asarray(seg8.compute_mask(Point(20, 20)).pixels)
    # Binary masks: identical up to threshold flips from the reassociation
    # noise above — require bitwise equality except a vanishing fraction.
    assert np.mean(m1 != m8) < 5e-3


def test_vit_process_parity():
    """ViT variants route through the sequence-parallel tier
    (parallel/sp.py). At this deliberately degenerate test geometry
    (grid 4 < window 14, so global blocks pad the row bands) the sp
    global-row slices reassociate a few f32 sums — measured max|d|
    2.9e-6 directly at the sam_vit_apply_sp level, so the tolerance
    below is the tier's own noise, not the runtime wiring's."""
    img = _image(seed=1)
    env1 = Environment(_opts(sam_variant="vit_b", sam_image_size=64))
    env8 = Environment(_opts(sam_variant="vit_b", sam_image_size=64,
                             scaleout_devices=0))
    emb1 = np.asarray(Segmentation.process(img, env1).embedding)
    emb8 = np.asarray(Segmentation.process(img, env8).embedding)
    np.testing.assert_allclose(emb8, emb1, atol=2e-5, rtol=1e-5)


def test_birefnet_segment_objects_parity(monkeypatch):
    """segment_objects routes through canvas-row sharding (the
    parallel/spatial.py scheme inlined into the serving program)."""
    import dlimgedit_tpu.runtime.birefnet as rb

    monkeypatch.setenv("DLIMG_BIREFNET_TEST_SLIM", "1")
    monkeypatch.setenv("DLIMG_BIREFNET_RESOLUTION", "64")
    img = _image(w=96, h=48, seed=2, channels=Channels.rgb)
    m1 = np.asarray(segment_objects(
        img, Environment(_opts(scaleout_devices=1))).pixels)
    m8 = np.asarray(segment_objects(
        img, Environment(_opts(scaleout_devices=0))).pixels)
    d = np.abs(m1.astype(np.int32) - m8.astype(np.int32))
    # u8 sigmoid output: reassociation noise moves a value by at most one
    # quantisation step, and only at rounding boundaries.
    assert d.max() <= 1 and np.mean(d > 0) < 5e-3
