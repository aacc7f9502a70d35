"""Golden-count + oracle-parity tests for the JAX detect pipeline.

Mirrors the reference integration suite (tests/test_detector.rs:25-33) and
additionally checks tag-ID and corner agreement against the NumPy oracle
(BASELINE.json demands 100% ID and <0.1 px corner agreement).
"""

import numpy as np
import pytest

from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import TagDetector as Oracle, load_image
from conftest import GOLDEN_COUNTS


@pytest.fixture(scope="module")
def detector():
    return TagDetector("t36h11")


@pytest.fixture(scope="module")
def oracle():
    return Oracle("t36h11")


@pytest.mark.parametrize("name", sorted(GOLDEN_COUNTS))
def test_detect_matches_reference(detector, oracle, data_dir, name):
    img = load_image(str(data_dir / f"{name}.png"))
    tags = detector.detect(img)
    assert len(tags) == GOLDEN_COUNTS[name]
    ref = oracle.detect(img)
    assert set(tags) == set(ref)
    for tid in tags:
        err = np.abs(np.asarray(tags[tid]) - np.asarray(ref[tid])).max()
        assert err < 0.1, (tid, err)


def test_refined_saddle_points(detector, oracle, data_dir):
    img = load_image(str(data_dir / "EuRoC.png"))
    ours = detector.refined_saddle_points(img)
    ref = oracle.refined_saddle_points(img)
    assert len(ours) == len(ref)
    ours_p = np.array(sorted((s.p for s in ours)))
    ref_p = np.array(sorted((s.p for s in ref)))
    assert np.abs(ours_p - ref_p).max() < 0.01


def test_empty_image(detector):
    blank = np.full((128, 160), 128, dtype=np.uint8)
    assert detector.detect(blank) == {}


def test_detect_batch(detector, data_dir):
    img = load_image(str(data_dir / "EuRoC.png"))
    batch = np.stack([img, np.zeros_like(img)])
    res = detector.detect_batch(batch)
    assert len(res) == 2
    assert len(res[0]) == GOLDEN_COUNTS["EuRoC"]
    assert res[1] == {}


def test_detect_batch_async_search_identical(detector, data_dir,
                                             monkeypatch):
    """The background search-overlap worker (AG_SEARCH_ASYNC=1) only
    changes the SCHEDULE; results must be bit-identical to the inline
    walk (the multi-pass two_boards scene exercises collect -> mutate ->
    resubmit ordering across waves)."""
    img = load_image(str(data_dir / "two_boards.png"))
    batch = np.stack([img, img])
    monkeypatch.setenv("AG_SEARCH_ASYNC", "0")
    inline = detector.detect_batch(batch)
    monkeypatch.setenv("AG_SEARCH_ASYNC", "1")
    threaded = detector.detect_batch(batch)
    assert len(inline) == len(threaded) == 2
    for a, b in zip(inline, threaded):
        assert set(a) == set(b)
        for tid in a:
            np.testing.assert_array_equal(
                np.asarray(a[tid]), np.asarray(b[tid])
            )
