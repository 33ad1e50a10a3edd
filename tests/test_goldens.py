"""Frozen-golden drift harness (VERDICT r4 #1b; the hermetic stand-in for
the reference's golden-PNG tests, /root/reference/test/test_utils.cpp:81-90,
whose real checkpoints/goldens need network this environment has never had).

Every other parity test in this suite recomputes a LIVE oracle next to the
device program, so a numeric drift that moves both sides — a jax upgrade
changing fusion, an accidental models/ edit, a quantisation regression —
passes silently. This file pins the actual OUTPUTS of every serving
program, computed from seeded deterministic weights, against artifacts
committed in tests/goldens/:

  * binary masks (point / region / multimask / batch / AMG) — byte-exact;
  * the BiRefNet grayscale mask — <= 1 quantum per pixel (u8 rounding may
    legitimately flip on FMA-contraction differences across CPUs);
  * embeddings / accuracies — summary stats to 1e-3 (f32 exactness across
    machines is not a contract XLA:CPU makes).

Regenerate CONSCIOUSLY after an intended numeric change:

    DLIMG_REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py -q

and commit the diff with the justification in the message.
"""

import hashlib
import json
import os
from pathlib import Path

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
    segment_objects,
)

GOLDEN_DIR = Path(__file__).parent / "goldens"
DIGEST_FILE = GOLDEN_DIR / "digests.json"
REGEN = os.environ.get("DLIMG_REGEN_GOLDENS") == "1"


def _sha(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


@pytest.fixture(scope="module")
def digests():
    if REGEN:
        GOLDEN_DIR.mkdir(exist_ok=True)
        d = {}
        yield d
        DIGEST_FILE.write_text(json.dumps(d, indent=1, sort_keys=True))
        return
    if not DIGEST_FILE.exists():
        pytest.fail("tests/goldens/digests.json missing — run with "
                    "DLIMG_REGEN_GOLDENS=1 once and commit the artifacts")
    yield json.loads(DIGEST_FILE.read_text())


def _record_mask(digests, key, mask: np.ndarray):
    """Byte-exact contract for a binary mask; the full array is committed
    too so a drift is inspectable, not just detected."""
    mask = np.ascontiguousarray(np.asarray(mask).squeeze())
    assert set(np.unique(mask)) <= {0, 255}, f"{key}: not a binary mask"
    if REGEN:
        np.save(GOLDEN_DIR / f"{key}.npy", mask)
        digests[key] = _sha(mask)
        return
    assert digests[key] == _sha(mask), (
        f"golden drift in {key}: committed {digests[key][:12]}..., "
        f"recomputed {_sha(mask)[:12]}... — diff vs tests/goldens/{key}.npy "
        f"({int(np.sum(np.load(GOLDEN_DIR / (key + '.npy')) != mask))} "
        f"pixels differ)")


def _record_floats(digests, key, values, atol=1e-3):
    values = [round(float(v), 6) for v in np.atleast_1d(values)]
    if REGEN:
        digests[key] = values
        return
    np.testing.assert_allclose(values, digests[key], atol=atol,
                               err_msg=f"golden drift in {key}")


@pytest.fixture(scope="module")
def env():
    return Environment(Options(
        backend=Backend.cpu, allow_random_weights=True,
        compute_dtype="float32", sam_image_size=64,
        largest_region_object=True))


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(42)
    return Image(Extent(96, 64), Channels.rgba,
                 rng.integers(0, 256, (64, 96, 4), dtype=np.uint8))


@pytest.fixture(scope="module")
def seg(env, img):
    return Segmentation.process(img, env)


def test_golden_embedding_stats(digests, seg):
    emb = np.asarray(seg.embedding, np.float64)
    _record_floats(digests, "embedding_stats",
                   [emb.mean(), emb.std(), emb.min(), emb.max()])


def test_golden_point_mask(digests, seg):
    _record_mask(digests, "mask_point",
                 seg.compute_mask(Point(30, 20)).pixels)


def test_golden_region_mask(digests, seg):
    # largest_region_object=True: the region path includes the
    # connected-component selection in the frozen program.
    _record_mask(digests, "mask_region",
                 seg.compute_mask(Region(Point(8, 8), Point(80, 56))).pixels)


def test_golden_multimask(digests, seg):
    masks = seg.compute_masks(Point(48, 32))
    for i, m in enumerate(masks):
        _record_mask(digests, f"mask_multi_{i}", m.image.pixels)
    _record_floats(digests, "multi_accuracies",
                   [m.accuracy for m in masks])


def test_golden_batch_decode(digests, seg):
    masks = seg.compute_mask_batch([
        Point(20, 20), Region(Point(4, 4), Point(60, 40)), Point(70, 50)])
    for i, m in enumerate(masks):
        _record_mask(digests, f"mask_batch_{i}", m.image.pixels)
    _record_floats(digests, "batch_accuracies",
                   [m.accuracy for m in masks])


def test_golden_amg(digests, seg):
    masks = seg.generate_masks(grid=4, max_masks=4, iou_thresh=0.0,
                               stability_thresh=0.0)
    if REGEN:
        digests["amg_count"] = len(masks)
    else:
        assert digests["amg_count"] == len(masks), "AMG selection drift"
    for i, m in enumerate(masks):
        _record_mask(digests, f"mask_amg_{i}", m.image.pixels)
    _record_floats(digests, "amg_accuracies", [m.accuracy for m in masks])


def test_golden_second_bucket(digests, env):
    """A second canvas bucket (512) freezes the resampling-matrix path at a
    different geometry — bucket selection bugs can't hide in one shape."""
    rng = np.random.default_rng(7)
    big = Image(Extent(300, 200), Channels.rgb,
                rng.integers(0, 256, (200, 300, 3), dtype=np.uint8))
    s = Segmentation.process(big, env)
    _record_mask(digests, "mask_bucket512",
                 s.compute_mask(Point(150, 100)).pixels)


def test_golden_birefnet(digests, env, img, monkeypatch):
    monkeypatch.setenv("DLIMG_BIREFNET_TEST_SLIM", "1")
    monkeypatch.setenv("DLIMG_BIREFNET_RESOLUTION", "64")
    mask = np.asarray(segment_objects(img, env).pixels).squeeze()
    key = "mask_birefnet"
    if REGEN:
        np.save(GOLDEN_DIR / f"{key}.npy", mask)
        digests[key] = _sha(mask)
        return
    want = np.load(GOLDEN_DIR / f"{key}.npy")
    # Grayscale u8: allow the rounding quantum, nothing more.
    diff = np.abs(mask.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, (
        f"golden drift in {key}: max quantum diff {diff.max()}, "
        f"{int((diff > 0).sum())} pixels differ")
