"""Board-chart generator round trip: every supported family's chart must
be fully re-detected by both the oracle and the JAX detector.

This doubles as end-to-end coverage for the non-T36H11 families, for
which the bundled photo set has no images (BASELINE.json config 4).
"""

import pytest

from aprilgrid_tpu.boards.generator import AprilGridBoard, generate_chart, render_png
from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import TagDetector as Oracle


FAMILIES = [
    ("t16h5", 2, 4, 4),     # family, border, grid x, grid y (30 codes max)
    ("t25h7", 2, 5, 5),
    ("t25h9", 2, 5, 5),
    ("t36h11", 2, 6, 6),
    ("t36h11b1", 1, 6, 6),
]


@pytest.mark.parametrize("family,border,sx,sy", FAMILIES)
def test_roundtrip_oracle(family, border, sx, sy):
    board = AprilGridBoard(
        size_x=sx, size_y=sy, tag_family=family, border_bits=border
    )
    img = render_png(board, pixels_per_mm=2.0)
    tags = Oracle(family).detect(img)
    assert sorted(tags) == list(range(sx * sy))


@pytest.mark.parametrize("family,border,sx,sy", [FAMILIES[0], FAMILIES[3]])
def test_roundtrip_jax(family, border, sx, sy):
    board = AprilGridBoard(
        size_x=sx, size_y=sy, tag_family=family, border_bits=border
    )
    img = render_png(board, pixels_per_mm=2.0)
    tags = TagDetector(family).detect(img)
    assert sorted(tags) == list(range(sx * sy))


def test_generate_chart_files(tmp_path):
    board = AprilGridBoard(size_x=2, size_y=2, tag_family="t16h5")
    written = generate_chart(board, tmp_path, pixels_per_mm=1.0)
    assert set(written) == {"svg", "png", "pdf", "json"}
    for p in written.values():
        assert p.exists() and p.stat().st_size > 0
    assert "<svg" in written["svg"].read_text()


def test_first_marker_offset():
    board = AprilGridBoard(
        size_x=2, size_y=2, tag_family="t36h11", first_marker=10
    )
    img = render_png(board, pixels_per_mm=2.0)
    tags = Oracle("t36h11").detect(img)
    assert sorted(tags) == [10, 11, 12, 13]
