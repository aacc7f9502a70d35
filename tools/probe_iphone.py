"""Attribute the iphone exact-mode gap (VERDICT r4 item 2).

iphone exact sits at ~193 fps while two_boards (same 1080p RGB
resolution) reaches ~313 and the measured device ceiling is ~420-450
(docs/ROADMAP.md session-3: the cluster kernel is scene-invariant).
This probe times, per scene, with the production hybrid pipeline:

  * end-to-end detect_batch wall (relay-synced),
  * total host time inside native.find_board_batch, split by call
    (wavefront order interleaves pass-0/pass-1 calls; each call's
    alive-saddle count is recorded so passes are identifiable),
  * the residual = e2e - host-search, i.e. device + transfers + Python.

Run (TPU): python tools/probe_iphone.py  [env: BENCH_BATCH, BENCH_REPS]
"""

import json
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

from aprilgrid_tpu import native
from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import load_image


def main() -> int:
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # BENCH_DECIMATE=1: probe the turbo (half-res) path instead of exact
    dec = os.environ.get("BENCH_DECIMATE", "0") not in ("0", "")
    det = TagDetector("t36h11", decimate="auto" if dec else False)

    orig = native.find_board_batch
    calls: list[dict] = []

    def timed(sx, sy, theta, alive, **kw):
        t0 = time.perf_counter()
        out = orig(sx, sy, theta, alive, **kw)
        calls.append({
            "s": time.perf_counter() - t0,
            "alive": int(alive.sum()),
            "boards": int((out[1] > 0).sum()),
            "frames": int(alive.shape[0]),
        })
        return out

    native.find_board_batch = timed

    for name, expect in (("two_boards", 72), ("iphone", 66)):
        img = load_image(f"tests/data/{name}.png")
        imgs = jnp.asarray(
            np.ascontiguousarray(np.broadcast_to(img, (batch,) + img.shape))
        )
        out = det.detect_batch(imgs)  # warm-up / compile
        n0 = len(out[0])
        assert n0 == expect, (name, n0, expect)

        best = None
        for _ in range(reps):
            calls.clear()
            t0 = time.perf_counter()
            det.detect_batch(imgs)
            e2e = time.perf_counter() - t0
            # split host calls into found-board vs no-board searches
            hit = [c for c in calls if c["boards"] > 0]
            miss = [c for c in calls if c["boards"] == 0]
            rec = {
                "scene": name,
                "fps": round(batch / e2e, 1),
                "e2e_ms_per_frame": round(1e3 * e2e / batch, 3),
                "host_search_ms_per_frame": round(
                    1e3 * sum(c["s"] for c in calls) / batch, 3
                ),
                "host_hit_ms_per_frame": round(
                    1e3 * sum(c["s"] for c in hit) / batch, 3
                ),
                "host_noboard_ms_per_frame": round(
                    1e3 * sum(c["s"] for c in miss) / batch, 3
                ),
                "residual_ms_per_frame": round(
                    1e3
                    * (e2e - sum(c["s"] for c in calls))
                    / batch,
                    3,
                ),
                "search_calls": len(calls),
                "alive_per_call": sorted(
                    {round(c["alive"] / c["frames"]) for c in calls}
                ),
            }
            rec["calls"] = [
                {"ms_per_frame": round(1e3 * c["s"] / c["frames"], 3),
                 "alive": round(c["alive"] / c["frames"]),
                 "board_frames": c["boards"], "frames": c["frames"]}
                for c in calls
            ]
            if best is None or rec["fps"] > best["fps"]:
                best = rec
        print(json.dumps(best))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
