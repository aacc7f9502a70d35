"""Host-only native-search profiler (no TPU / relay required).

Reconstructs the exact pass-1 and pass-2 saddle sets for a golden scene
with the NumPy oracle (aprilgrid_tpu/oracle/numpy_ref.py reproduces the
Rust reference bit-exactly), then times native.find_board_batch on each
pass in isolation.  Run with AG_SEARCH_STATS=1 to get the per-call
cycle sub-breakdown (init/grow/cp/vr + knn50/g1/nest) from search.cpp.

Usage:
  env -u PALLAS_AXON_POOL_IPS AG_SEARCH_STATS=1 \
      python tools/profile_search.py [scene ...]   (default: iphone)
Env: PROF_REPS (default 32 frames per batch call), PROF_CALLS (default 3).
"""

import os
import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

import numpy as np

from aprilgrid_tpu import native
from aprilgrid_tpu.oracle import numpy_ref as oracle


def saddle_arrays(refined):
    sx = np.array([s.p[0] for s in refined], np.float32)
    sy = np.array([s.p[1] for s in refined], np.float32)
    th = np.array([s.theta for s in refined], np.float32)
    return sx, sy, th


def main() -> int:
    scenes = sys.argv[1:] or ["iphone"]
    reps = int(os.environ.get("PROF_REPS", "32"))
    calls = int(os.environ.get("PROF_CALLS", "3"))
    det = oracle.TagDetector("t36h11")

    for name in scenes:
        img = oracle.load_image(f"tests/data/{name}.png")
        gray8 = oracle.to_luma8(img)
        refined = det.refined_saddle_points(img)
        print(f"=== {name}: {len(refined)} refined saddles")

        for pass_i in range(det.params.max_num_of_boards):
            sx, sy, th = saddle_arrays(refined)
            n = len(refined)
            alive = np.ones((reps, n), np.uint8)
            bx = np.broadcast_to(sx, (reps, n)).copy()
            by = np.broadcast_to(sy, (reps, n)).copy()
            bt = np.broadcast_to(th, (reps, n)).copy()

            best = None
            for _ in range(calls):
                t0 = time.perf_counter()
                quads, counts = native.find_board_batch(
                    bx, by, bt, alive,
                    spacing_ratio=det.params.tag_spacing_ratio,
                    max_seeds=30, early_exit_score=36,  # config.py:40-41
                )
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"pass {pass_i}: m={n} {1e3 * best / reps:.3f} ms/frame "
                  f"(batch {reps}, best of {calls}), boards/frame="
                  f"{counts[0]}")

            # advance to the next pass exactly like the detector: decode
            # the found board's quads with the oracle and remove the
            # saddles of successfully decoded tags
            board_tags = oracle.try_find_best_board(refined)
            if board_tags is None:
                break
            to_remove = set()
            for quad_indexes in board_tags:
                quad_points = [refined[i].p for i in quad_indexes]
                res = det._try_decode_quad(gray8, quad_points)
                if res is not None:
                    to_remove.update(quad_indexes)
            refined = [s for i, s in enumerate(refined)
                       if i not in to_remove]
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
