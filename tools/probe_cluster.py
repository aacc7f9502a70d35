"""Directed micro-bench of the fused cluster+ROCHADE kernel alone.

Times cluster_rochade on two_boards at BENCH_BATCH (default 64), synced
with a tiny host read (block_until_ready under-reports on the relay).
Run: python tools/probe_cluster.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from aprilgrid_tpu.config import CONSTANTS
from aprilgrid_tpu.oracle.numpy_ref import load_image
from aprilgrid_tpu.pallas.cluster import cluster_rochade
from aprilgrid_tpu.pallas.frontend import front_kernel


def main():
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "6"))
    img = load_image("tests/data/two_boards.png")
    h, w = img.shape[:2]
    imgs = jnp.asarray(
        np.ascontiguousarray(np.broadcast_to(img, (batch,) + img.shape))
    )

    blur_p, luma8, tile_min = front_kernel(imgs, CONSTANTS.blur_sigma)
    thr = jnp.min(tile_min, axis=(1, 2, 3)) * CONSTANTS.response_threshold_ratio
    blur_p = jax.block_until_ready(blur_p)
    np.asarray(luma8[0, 0, 0])

    fn = jax.jit(lambda b, t: cluster_rochade(b, t, h, w, 4, 1.0))

    fields, counts = fn(blur_p, thr)
    np.asarray(fields[0, 0, 0])
    print("appended/frame:", np.asarray(counts[:2, 0]), "dropped:", np.asarray(counts[:2, 1]))

    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fields, counts = fn(blur_p, thr)
        np.asarray(fields[0, 0, 0])  # tiny sync read
        best = min(best, time.time() - t0)
    print(f"cluster_rochade b{batch}: {best*1e3:.1f} ms  ({best/batch*1e6:.0f} us/frame)")


if __name__ == "__main__":
    main()
