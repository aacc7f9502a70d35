"""Golden-count integration tests for the NumPy oracle.

Mirrors the reference integration suite (tests/test_detector.rs:25-33):
exact detected-tag counts on the bundled real images, T36H11 family. The
oracle is the parity baseline the TPU pipeline is tested against.
"""

import pytest

from aprilgrid_tpu.oracle.numpy_ref import TagDetector, load_image
from conftest import GOLDEN_COUNTS


@pytest.fixture(scope="module")
def detector():
    return TagDetector("t36h11")


@pytest.mark.parametrize("name", sorted(GOLDEN_COUNTS))
def test_golden_count(detector, data_dir, name):
    img = load_image(str(data_dir / f"{name}.png"))
    tags = detector.detect(img)
    assert len(tags) == GOLDEN_COUNTS[name]
    # ids must be unique (dict) and corners finite 4-point quads
    for tag_id, corners in tags.items():
        assert 0 <= tag_id < detector.spec.num_codes
        assert len(corners) == 4


def test_family_tables():
    from aprilgrid_tpu.families import TagFamily, get_family

    sizes = {"t16h5": 30, "t25h7": 242, "t25h9": 35, "t36h11": 587}
    for name, n in sizes.items():
        spec = get_family(name)
        assert spec.num_codes == n
        assert spec.code_bits.shape == (n, spec.edge**2)
    b1 = get_family("t36h11b1")
    assert b1.border == 1 and b1.num_codes == 587
    assert TagFamily.from_str("T36H11") is TagFamily.T36H11


def test_rotation_permutation_matches_packed_rotation():
    import numpy as np

    from aprilgrid_tpu.families import rotation_permutation, unpack_bits_lsb
    from aprilgrid_tpu.oracle.numpy_ref import rotate_bits

    rng = np.random.default_rng(0)
    for edge in (4, 5, 6):
        perm = rotation_permutation(edge)
        for _ in range(10):
            bits = int(rng.integers(0, 2 ** (edge * edge), dtype=np.uint64))
            vec = unpack_bits_lsb(np.array([bits], dtype=np.uint64), edge * edge)[0]
            rotated_vec = vec[perm]
            expected = rotate_bits(bits, edge)
            got = sum(int(b) << i for i, b in enumerate(rotated_vec))
            assert got == expected
