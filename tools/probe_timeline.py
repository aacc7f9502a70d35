"""Host-side event timeline of the hybrid runtime (AG_TIMELINE hook).

Prints, for one detect_batch call after warm-up, every host blocking
site's (start, duration) relative to the call start, plus the idle gaps
between consecutive host events. This attributes the e2e-minus-device
gap the budget table (tools/probe_budget.py) exposes: which reads
block, for how long, and where the host sits idle.

Usage: python tools/probe_timeline.py [scene] (default two_boards)
Env: BENCH_BATCH (128), AG_CHUNK, BENCH_DECIMATE.
"""

import os
import sys
import time
from pathlib import Path

sys.path.append(str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["AG_TIMELINE"] = "1"

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

    scene = sys.argv[1] if len(sys.argv) > 1 else "two_boards"
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    dec = os.environ.get("BENCH_DECIMATE", "0") not in ("0", "")
    det = TagDetector("t36h11", decimate="auto" if dec else False)

    img = load_image(f"tests/data/{scene}.png")
    imgs = jnp.asarray(
        np.ascontiguousarray(np.broadcast_to(img, (batch,) + img.shape))
    )
    det.detect_batch(imgs)  # warm-up / compile

    t0 = time.perf_counter()
    det.detect_batch(imgs)
    e2e = time.perf_counter() - t0
    tl = sorted(det.last_timeline, key=lambda e: e[1])

    print(f"# {scene} b{batch} e2e {1e3 * e2e:.1f} ms "
          f"({batch / e2e:.1f} fps)")
    print(f"{'start_ms':>9} {'dur_ms':>8} {'gap_ms':>8}  label")
    base = tl[0][1]
    prev_end = base
    blocked = 0.0
    for label, a, b in tl:
        gap = a - prev_end
        print(f"{1e3 * (a - base):>9.1f} {1e3 * (b - a):>8.1f} "
              f"{1e3 * gap:>8.1f}  {label}")
        blocked += b - a
        prev_end = max(prev_end, b)
    print(f"# host blocked in listed events: {1e3 * blocked:.1f} ms "
          f"({100 * blocked / e2e:.0f}% of e2e); the gaps are Python "
          f"between events (result processing, qarr packing, dispatch "
          f"bookkeeping)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
