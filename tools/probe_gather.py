"""Probe XLA gather lowerings for the decode bit-sampler on TPU.

The decode step samples (B, T=192, nb=36) u8 pixels from (B, 1088, 1920)
planes. Times several equivalent formulations.
Run: python tools/probe_gather.py
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


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(out.reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(out.reshape(-1)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    b, h, w, t, nb = 128, 1088, 1920, 192, 36
    rng = np.random.default_rng(0)
    luma = jnp.asarray(rng.integers(0, 255, (b, h, w), np.uint8))
    yi = jnp.asarray(rng.integers(0, h, (b, t, nb), np.int32))
    xi = jnp.asarray(rng.integers(0, w, (b, t, nb), np.int32))

    @jax.jit
    def v_2d(luma, yi, xi):
        return jax.vmap(lambda l, y, x: l[y, x])(luma, yi, xi).astype(jnp.int32)

    @jax.jit
    def v_flat(luma, yi, xi):
        flat = luma.reshape(b, h * w)
        lin = yi * w + xi
        return jax.vmap(jnp.take)(flat, lin).astype(jnp.int32)

    @jax.jit
    def v_flat_i32(luma, yi, xi):
        flat = luma.reshape(b, h * w).astype(jnp.int32)
        lin = yi * w + xi
        return jax.vmap(jnp.take)(flat, lin)

    @jax.jit
    def v_rowgather(luma, yi, xi):
        # two-stage: gather rows (T*nb, w) then columns via one-hot? too big
        # instead: gather with take_along_axis on rows then cols
        rows = jax.vmap(lambda l, y: l[y.reshape(-1)])(luma, yi)  # (b, t*nb, w)
        out = jax.vmap(
            lambda r, x: jnp.take_along_axis(r, x.reshape(-1, 1), axis=1)
        )(rows, xi)
        return out.reshape(b, t, nb).astype(jnp.int32)

    for name, fn in [("2d-index", v_2d), ("flat-take-u8", v_flat),
                     ("flat-take-i32", v_flat_i32)]:
        try:
            dt = timeit(fn, luma, yi, xi)
            print(f"{name:16s} {dt*1e3:8.1f} ms  ({dt/b*1e6:.0f} us/frame)")
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}")


if __name__ == "__main__":
    main()
