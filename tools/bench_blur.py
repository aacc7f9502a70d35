#!/usr/bin/env python
"""Blur microbenchmark: Pallas fused front-end vs pure-XLA blur.

Port of the reference's blur A/B regression bench
(/root/reference/benches/bench_blur.rs:7-15 — crate gaussian_blur_f32 vs
imageproc), recast for the TPU build: the A side is the fused Pallas
front-end kernel (gray + blur + response-min in one pass), the B side is
the XLA separable blur (ops/frontend.gaussian_blur). Runs every bundled
test image; prints one JSON line per image plus a summary line.

Usage: python tools/bench_blur.py  [BLUR_REPS=5]
"""

import json
import os
import sys
import time
from pathlib import Path

# appended (not prepended) so nothing in the repo shadows site modules
# (a PYTHONPATH=. prepend breaks the TPU relay plugin discovery)
sys.path.append(str(Path(__file__).resolve().parent.parent))


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    import jax.numpy as jnp

    from aprilgrid_tpu.ops.frontend import gaussian_blur
    from aprilgrid_tpu.ops.gray import to_luma
    from aprilgrid_tpu.pallas.frontend import front_kernel

    reps = int(os.environ.get("BLUR_REPS", "5"))
    data = sorted(Path("tests/data").glob("*.png"))

    def sync(out):
        # slice ON DEVICE before converting: np.asarray on the full
        # leaf would download hundreds of MB through the relay
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf[(slice(0, 1),) * leaf.ndim])

    def best_of(fn, *args):
        sync(fn(*args))  # warm/compile
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    from aprilgrid_tpu.oracle.numpy_ref import load_image

    # batch each image so kernel time dominates the ~50 ms relay
    # round-trip latency; report per-frame milliseconds
    bsz = int(os.environ.get("BLUR_BATCH", "16"))
    speedups = []
    for path in data:
        img = load_image(str(path))
        raw = jnp.asarray(
            np.ascontiguousarray(np.broadcast_to(img, (bsz,) + img.shape))
        )
        luma, _ = to_luma(jnp.asarray(img))
        lumab = jnp.asarray(
            np.ascontiguousarray(
                np.broadcast_to(np.asarray(luma), (bsz,) + luma.shape)
            )
        )
        pallas_fn = jax.jit(lambda x: front_kernel(x, 1.5))
        xla_fn = jax.jit(jax.vmap(lambda x: gaussian_blur(x, 1.5)))
        t_pallas = best_of(pallas_fn, raw) / bsz
        t_xla = best_of(xla_fn, lumab) / bsz
        speedups.append(t_xla / t_pallas)
        print(
            json.dumps(
                {
                    "metric": f"blur {path.stem} ({img.shape[1]}x{img.shape[0]})",
                    "pallas_fused_ms_per_frame": round(t_pallas * 1e3, 3),
                    "xla_blur_ms_per_frame": round(t_xla * 1e3, 3),
                    "note": "pallas side also does gray+hessian-min",
                }
            )
        )

    geo = float(np.exp(np.mean(np.log(speedups))))
    print(
        json.dumps(
            {
                "metric": "blur A/B geomean speedup (xla_ms / pallas_fused_ms)",
                "value": round(geo, 3),
                "unit": "x",
                "vs_baseline": round(geo, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
