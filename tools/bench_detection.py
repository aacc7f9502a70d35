"""Per-image detect() bench over the bundled test set — the TPU
equivalent of the reference's whole-pipeline diol harness
(/root/reference/benches/bench_detection.rs:7-36, which times detect()
on each bundled image single-threaded).

Each image is batched to BENCH_BATCH frames and streamed through the
hybrid pipeline; prints one JSON line per image plus a geomean line.

Run: python tools/bench_detection.py   (env: BENCH_BATCH, BENCH_REPS)
"""

import json
import math
import os
import sys
import time
from pathlib import Path

# appended (not prepended): PYTHONPATH=. shadows the TPU relay plugin
sys.path.append(str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import load_image

# the reference's golden counts (tests/test_detector.rs:25-33)
IMAGES = [
    ("EuRoC", 36),
    ("TUM_VI", 36),
    ("right", 36),
    ("r45", 36),
    ("top", 36),
    ("iphone", 66),
    ("two_boards", 72),
]


def main() -> int:
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # BENCH_DECIMATE=1: the approximate turbo mode with the "auto"
    # policy (>= 2 MP frames decimate; golden counts all hold)
    decimate = os.environ.get("BENCH_DECIMATE", "0") not in ("0", "")
    det = TagDetector("t36h11", decimate="auto" if decimate else False)

    fps_all = []
    for name, expect in IMAGES:
        img = load_image(f"tests/data/{name}.png")
        imgs = jnp.asarray(
            np.ascontiguousarray(np.broadcast_to(img, (batch,) + img.shape))
        )
        out = det.detect_batch(imgs)
        n = len(out[0])
        assert n == expect, f"{name}: expected {expect} tags, got {n}"
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            det.detect_batch(imgs)
            best = min(best, time.time() - t0)
        fps = batch / best
        fps_all.append(fps)
        h, w = img.shape[:2]
        print(
            json.dumps(
                {
                    "metric": f"detect() {name} ({w}x{h}, {n} tags)",
                    "value": round(fps, 2),
                    "unit": "fps/chip",
                    "vs_baseline": round(fps / 2000.0, 4),
                }
            ),
            flush=True,
        )
    geo = math.exp(sum(math.log(f) for f in fps_all) / len(fps_all))
    print(
        json.dumps(
            {
                "metric": "detect() geomean over the 7 golden images",
                "value": round(geo, 2),
                "unit": "fps/chip",
                "vs_baseline": round(geo / 2000.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
