"""Chunk-size ladder for the hybrid pipeline (e2e, best-of reps).

The chunk size trades host/device overlap granularity against fixed
per-chunk relay costs (~30-40 ms per dispatch/read). The fused tail
read (round-5) shifts the balance toward larger chunks — re-ladder.

Usage: python tools/probe_chunk.py [scene ...]   (default two_boards TUM_VI)
Env: BENCH_BATCH (128), BENCH_REPS (3), CHUNKS ("32,48,64"),
     BENCH_DECIMATE (0).
"""

import os
import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from aprilgrid_tpu.detector import TagDetector
    from aprilgrid_tpu.oracle.numpy_ref import load_image

    scenes = sys.argv[1:] or ["two_boards", "TUM_VI"]
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    chunks = [int(c) for c in os.environ.get("CHUNKS", "32,48,64").split(",")]
    dec = os.environ.get("BENCH_DECIMATE", "0") not in ("0", "")
    det = TagDetector("t36h11", decimate="auto" if dec else False)

    for name in scenes:
        img = load_image(f"tests/data/{name}.png")
        imgs = jnp.asarray(
            np.ascontiguousarray(np.broadcast_to(img, (batch,) + img.shape))
        )
        for chunk in chunks:
            det.detect_batch(imgs, chunk=chunk)  # warm
            best = 0.0
            for _ in range(reps):
                t0 = time.perf_counter()
                out = det.detect_batch(imgs, chunk=chunk)
                dt = time.perf_counter() - t0
                best = max(best, batch / dt)
            n = len(out[0])
            print(f"{name} chunk={chunk}: {best:.1f} fps ({n} tags)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
