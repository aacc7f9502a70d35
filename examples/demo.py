#!/usr/bin/env python
"""Demo: detect AprilGrid tags over a directory of frames and write
overlay images (the reference's examples/demo.rs, with PNG overlays in
place of rerun.io streams).

Usage: python examples/demo.py [--dir tests/data] [--out /tmp/aprilgrid_demo]
"""

import argparse
import glob
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="tests/data")
    p.add_argument("--out", default="/tmp/aprilgrid_demo")
    p.add_argument("--family", default="t36h11")
    p.add_argument("--mode", default="hybrid", choices=["hybrid", "xla"])
    args = p.parse_args()

    from aprilgrid_tpu.detector import TagDetector
    from aprilgrid_tpu.oracle.numpy_ref import load_image
    from aprilgrid_tpu.viz import dump_overlay

    det = TagDetector(args.family, mode=args.mode)
    frames = sorted(glob.glob(os.path.join(args.dir, "*.png")))
    os.makedirs(args.out, exist_ok=True)
    for f in frames:
        img = load_image(f)
        t0 = time.time()
        tags = det.detect(img)
        dt = time.time() - t0
        out = Path(args.out) / (Path(f).stem + "_overlay.png")
        dump_overlay(out, img, tags=tags)
        print(f"{Path(f).name}: {len(tags)} tags in {dt*1000:.1f} ms -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
