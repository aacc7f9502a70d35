"""Profile the host board search per pass on a bundled image.

Uses the NumPy oracle front-end (host, exact) to get the saddle set,
runs pass-1 search, removes the decoded board's saddles like the
pipeline does, then times pass-2 on the leftovers.
Run: python tools/probe_pass2.py [image]
"""

import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

import numpy as np

from aprilgrid_tpu import native
from aprilgrid_tpu.oracle import numpy_ref as R


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "iphone"
    img = R.load_image(f"tests/data/{name}.png")
    saddles = R.refined_saddle_points(img)
    px = np.array([s.p[0] for s in saddles], np.float32)
    py = np.array([s.p[1] for s in saddles], np.float32)
    th = np.array([s.theta for s in saddles], np.float32)
    alive = np.ones(len(saddles), np.uint8)
    print(f"{name}: {len(saddles)} saddles")

    def timeit(alive, label, reps=20):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = native.find_board(px, py, th, alive)
            best = min(best, time.perf_counter() - t0)
        print(f"  {label}: {best*1e3:.2f} ms, {len(out)} tag quads")
        return out

    q1 = timeit(alive, "pass 1")
    # assume all pass-1 quads decode (upper bound on removal)
    alive2 = alive.copy()
    for q in q1:
        alive2[q] = 0
    timeit(alive2, f"pass 2 ({int(alive2.sum())} alive)")


if __name__ == "__main__":
    main()
