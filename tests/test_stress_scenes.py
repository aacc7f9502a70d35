"""Randomized synthetic-scene parity stress test.

Charts are rendered at random scales/rotations/offsets with noise and
run through both the oracle and the JAX detector. This probes the
divergence surfaces the bundled photos cannot (parallel-frontier growth
order, fixed capacities, Pallas window caps): the detectors must agree
on the tag-ID set; corner disagreement must stay under the 0.1 px bar
whenever the set matches.
"""

import numpy as np
import pytest

from conftest import make_stress_scene as _scene
from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import TagDetector as Oracle


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 11])
def test_random_scene_parity(seed):
    img = _scene(seed)
    ref = Oracle("t36h11").detect(img)
    got = TagDetector("t36h11").detect(img)
    assert set(got) == set(ref), (
        f"seed {seed}: jax={sorted(got)} oracle={sorted(ref)}"
    )
    for tid in got:
        err = np.abs(np.asarray(got[tid]) - np.asarray(ref[tid])).max()
        assert err < 0.1, (seed, tid, err)
    # a rotated/scaled 4x4 board should be mostly recovered
    assert len(ref) >= 8, f"seed {seed}: oracle only found {len(ref)}"
