"""4K multi-camera streaming bench (BASELINE.json config 5).

Simulates a 4-camera 4K rig by tiling the hardest bundled frame to
3840x2160 (four boards per frame, 144 tags) and streaming batches
through the hybrid pipeline. Prints one JSON line.
"""

import json
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


def main() -> int:
    cams = int(os.environ.get("BENCH_CAMS", "4"))
    # enough stream steps that the chunked hybrid pipeline can overlap
    # host search with device front-ends (4K chunks are 8 frames)
    steps = int(os.environ.get("BENCH_STEPS", "8"))

    base = load_image("tests/data/two_boards.png")  # 1080x1920 RGB
    # a 4K camera viewing the two-board scene: embed at the canvas center
    frame4k = np.full((2160, 3840, 3), 128, np.uint8)
    frame4k[540:1620, 960:2880] = base
    frames = jnp.asarray(
        np.broadcast_to(frame4k, (cams * steps,) + frame4k.shape).copy()
    )

    # Both modes, one line each: exact (reference parity) and turbo
    # (half-res detect + full-res corner re-refine; finds the same 72
    # tags on this scene, asserted below). BENCH_DECIMATE=1 restricts
    # to turbo-only, BENCH_DECIMATE=0 stays both.
    modes = [("", False), (", turbo", "auto")]
    if os.environ.get("BENCH_DECIMATE", "") == "1":
        modes = [(", turbo", "auto")]
    rc = 0
    for suffix, dec in modes:
        det = TagDetector("t36h11", decimate=dec)
        out = det.detect_batch(frames)
        n = len(out[0])
        assert n == 72, f"expected 72 tags on the 4K frame, got {n}"

        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            det.detect_batch(frames)
            best = min(best, time.time() - t0)

        fps = frames.shape[0] / best
        print(
            json.dumps(
                {
                    "metric": (
                        f"4K detect() throughput, {cams}-camera stream "
                        f"(tags/frame={n}{suffix})"
                    ),
                    "value": round(fps, 2),
                    "unit": "fps/chip",
                    "vs_baseline": round(fps / 2000.0, 4),
                }
            ),
            flush=True,
        )
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
