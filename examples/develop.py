#!/usr/bin/env python
"""Develop: debug harness visualizing pipeline intermediates for one
image (the reference's examples/develop.rs) — refined saddles with
orientation ticks, board quads, and decoded tags.

Usage: python examples/develop.py tests/data/EuRoC.png
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("--out", default="/tmp/aprilgrid_develop.png")
    p.add_argument("--family", default="t36h11")
    args = p.parse_args()

    import numpy as np

    from aprilgrid_tpu.detector import TagDetector
    from aprilgrid_tpu.oracle.numpy_ref import load_image
    from aprilgrid_tpu import native
    from aprilgrid_tpu.viz import dump_overlay

    det = TagDetector(args.family)
    img = load_image(args.image)
    saddles = det.refined_saddle_points(img)
    print(f"refined saddles: {len(saddles)}")

    px = np.array([s.p[0] for s in saddles], np.float32)
    py = np.array([s.p[1] for s in saddles], np.float32)
    th = np.array([s.theta for s in saddles], np.float32)
    quads = native.find_board(px, py, th, np.ones(len(saddles), np.uint8))
    print(f"board quads: {len(quads)}")

    tags = det.detect(img)
    print(f"decoded tags: {len(tags)}")

    out = dump_overlay(args.out, img, tags=tags, saddles=saddles)
    print(f"overlay -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
