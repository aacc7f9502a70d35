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
from aprilgrid_tpu.pallas.cluster import cluster_rochade_raw
from aprilgrid_tpu.pallas.frontend import front_kernel, pad_raw


def main():
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "6"))
    name = os.environ.get("BENCH_IMG", "two_boards")
    img = load_image(f"tests/data/{name}.png")
    h, w = img.shape[:2]
    imgs = jnp.asarray(
        np.ascontiguousarray(np.broadcast_to(img, (batch,) + img.shape))
    )

    raw_p, _h, _w, channels, u16 = pad_raw(imgs)
    raw_p = jax.block_until_ready(raw_p)

    minfn = jax.jit(
        lambda r: front_kernel(
            r, CONSTANTS.blur_sigma, emit_blur=False, pre_padded=True,
            true_shape=(h, w), channels=channels, u16=u16,
        )
    )
    luma8, tile_min = minfn(raw_p)
    thr = jnp.min(tile_min, axis=(1, 2, 3)) * CONSTANTS.response_threshold_ratio
    thr = jax.block_until_ready(thr)
    np.asarray(luma8[0, 0, 0])

    # AG_PREFILTER / AG_WIN knobs for A/B
    prefilter = os.environ.get("AG_PREFILTER", "0") not in ("0", "")
    win = int(os.environ.get("AG_WIN", "184"))
    fn = jax.jit(
        lambda r, t: cluster_rochade_raw(
            r, t, h, w, channels=channels, u16=u16,
            prefilter=prefilter, win=win,
        )
    )
    fields, counts = fn(raw_p, thr)
    np.asarray(fields[0, 0, 0])
    print("appended/frame:", np.asarray(counts[:2, 0]), "dropped:", np.asarray(counts[:2, 1]))

    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fields, counts = fn(raw_p, thr)
        np.asarray(fields[0, 0, 0])  # tiny sync read
        best = min(best, time.time() - t0)
    print(f"cluster_rochade_raw[{name}] b{batch}: {best*1e3:.1f} ms  ({best/batch*1e6:.0f} us/frame)")

    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        luma8, tile_min = minfn(raw_p)
        np.asarray(luma8[0, 0, 0])
        best = min(best, time.time() - t0)
    print(f"front_min[{name}] b{batch}: {best*1e3:.1f} ms  ({best/batch*1e6:.0f} us/frame)")


if __name__ == "__main__":
    main()
