"""Golden tests for the pure-XLA execution mode.

mode="xla" runs the ENTIRE detect — including board growth as the
parallel-frontier fixpoint (ops/board.py, ops/search.py) — inside one
jitted program; these tests pin its end-to-end correctness (the default
hybrid mode exercises the native C++ search instead).
"""

import numpy as np
import pytest

from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import TagDetector as Oracle, load_image


@pytest.fixture(scope="module")
def detector():
    return TagDetector("t36h11", mode="xla")


@pytest.mark.parametrize("name,expected", [("EuRoC", 36), ("two_boards", 72)])
def test_xla_mode_golden(detector, data_dir, name, expected):
    img = load_image(str(data_dir / f"{name}.png"))
    tags = detector.detect(img)
    ref = Oracle("t36h11").detect(img)
    assert len(tags) == expected
    assert set(tags) == set(ref)
    for tid in tags:
        err = np.abs(np.asarray(tags[tid]) - np.asarray(ref[tid])).max()
        assert err < 0.1, (tid, err)
