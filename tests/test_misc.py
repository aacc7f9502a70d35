"""Smoke tests for the auxiliary surfaces (profiling, viz, CLI)."""

import numpy as np

from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import load_image


def test_stage_report(data_dir):
    from aprilgrid_tpu.utils.profiling import detect_stage_report

    det = TagDetector("t36h11")
    img = load_image(str(data_dir / "EuRoC.png"))
    report = detect_stage_report(det, np.stack([img]), reps=1)
    assert "board search" in report and "total" in report


def test_overlay_render(data_dir):
    from aprilgrid_tpu.viz import render_overlay

    det = TagDetector("t36h11")
    img = load_image(str(data_dir / "EuRoC.png"))
    tags = det.detect(img)
    out = render_overlay(img, tags=tags, saddles=det.refined_saddle_points(img))
    assert out.shape == img.shape + (3,)
    assert out.dtype == np.uint8


def test_chart_cli(tmp_path):
    import subprocess
    import sys

    res = subprocess.run(
        [
            sys.executable, "tools/generate_aprilgrid.py", "-t", "t16h5",
            "-x", "2", "-y", "2", "--out-dir", str(tmp_path),
            "--pixels-per-mm", "0.5",
        ],
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr
    assert (tmp_path / "t16h5_2x2_start_id_0.png").exists()


def test_hybrid_chunk_default_scales_with_resolution():
    """The hybrid chunk default follows a constant pixel budget,
    rounded down to a power of two."""
    from aprilgrid_tpu.detector import _default_chunk

    assert _default_chunk(1080, 1920) == 32
    # 4K A/B (round 5): 133 fps exact at 16 vs 116 at 8
    assert _default_chunk(2160, 3840) == 16
    assert _default_chunk(480, 752) == 64
    # ~1 MP frames: device work halves but per-chunk relay costs don't
    # (round-5 ladder: TUM_VI 393 fps at chunk 32 vs 451/442 at 48/64)
    assert _default_chunk(1024, 1024) == 64


def test_api_parity_structs():
    """Reference-surface structs that the pipeline itself never calls
    (Tag, saddle_distance2 — dead code upstream too) still exist for
    API parity (src/detector.rs:189-192, src/saddle.rs:69-73)."""
    from aprilgrid_tpu.detector import Saddle, Tag, saddle_distance2

    t = Tag(id=7, p=[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    assert t.id == 7 and len(t.p) == 4
    s0 = Saddle(p=(0.0, 0.0), k=1.0, theta=0.0, phi=45.0)
    s1 = Saddle(p=(3.0, 4.0), k=1.0, theta=0.0, phi=45.0)
    assert saddle_distance2(s0, s1) == 25.0


def test_no_board_frames_detect_empty():
    """Blank / pure-noise frames must return {} through the hybrid
    pipeline (and exercise the pass-skip + zero-quad decode-skip paths:
    pass 2 never searches, no decode round trips are dispatched)."""
    import numpy as np

    from aprilgrid_tpu.detector import TagDetector

    det = TagDetector("t36h11")
    rng = np.random.default_rng(0)
    frames = np.stack(
        [
            np.full((240, 320), 128, np.uint8),
            rng.integers(0, 255, (240, 320), np.uint8).astype(np.uint8),
        ]
    )
    out = det.detect_batch(frames)
    assert out == [{}, {}]


def test_timeline_html_embeds_valid_data(tmp_path):
    """The interactive timeline viewer must embed parseable layer data
    (no browser in CI — validate the payload statically)."""
    import json
    import re

    from aprilgrid_tpu.viz import write_timeline_html

    entries = [
        {
            "image": "f0.png",
            "timeline_ns": 0,
            "detect_ms": 1.5,
            "tags": {3: [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]},
            "decode_points": {3: [[0.5, 0.5]]},
            "saddles": [[0.2, 0.3, 45.0]],
        }
    ]
    path = write_timeline_html(tmp_path, entries)
    html = path.read_text()
    data = json.loads(re.search(r"const F=(\[.*?\]);let", html, re.S).group(1))
    assert len(data) == 1 and data[0]["image"] == "f0.png"
    assert "3" in data[0]["tags"] and len(data[0]["tags"]["3"]) == 4
