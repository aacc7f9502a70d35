"""Live detection viewer — the reference's rerun streaming demo, served
over plain HTTP/MJPEG (reference: /root/reference/examples/demo.rs
streams image + saddles + tag corners + decode points to rerun.io;
aprilgrid_tpu.live provides the dependency-free equivalent).

Loops over the images in --dir (simulating a camera), detects on each,
and publishes every frame with all overlay layers. Open the printed URL
in a browser to watch; /latest.jpg and /state.json serve headless
consumers.

Usage: python examples/live.py [--dir tests/data] [--port 8000]
       [--loops N]  (N=0: stream forever)
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="tests/data")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--loops", type=int, default=0)
    ap.add_argument("--fps", type=float, default=2.0)
    args = ap.parse_args()

    from aprilgrid_tpu.detector import TagDetector
    from aprilgrid_tpu.live import LiveStream

    det = TagDetector("t36h11")
    stream = LiveStream(port=args.port).start()
    print(f"live viewer: http://127.0.0.1:{stream.port}/", flush=True)

    paths = sorted(Path(args.dir).glob("*.png"))
    loops = 0
    while args.loops == 0 or loops < args.loops:
        for p in paths:
            img = np.asarray(Image.open(p))
            t0 = time.time()
            tags = det.detect(img)
            saddles = det.refined_saddle_points(img)
            stream.publish(img, tags=tags, saddles=saddles)
            dt = time.time() - t0
            print(
                f"{p.name}: {len(tags)} tags, {len(saddles)} saddles, "
                f"{dt * 1e3:.0f} ms",
                flush=True,
            )
            time.sleep(max(0.0, 1.0 / args.fps - dt))
        loops += 1
    stream.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
