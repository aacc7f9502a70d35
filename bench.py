#!/usr/bin/env python
"""Benchmark: batched detect() throughput on one TPU chip.

Prints one JSON line per bundled golden image, then ONE final JSON line
with the HEADLINE metric — the geometric mean over the 7 reference-
benchmarked images (the reference's diol harness times detect() on each
of these single-threaded, /root/reference/benches/bench_detection.rs):
  {"metric": "...", "value": N, "unit": "fps/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
against the north-star target from BASELINE.json — 2000 fps/chip.

Method: each image is batched BATCH times (frames device-resident: the
metric is detect() throughput; ingest is overlapped in production via
parallel.streaming.detect_stream) and detected with the hybrid pipeline;
steady-state wall time, best-of-REPS (the relay tunnel adds ±8-15 %
run-to-run variance). Correctness is asserted per image against the
reference's golden tag counts (tests/test_detector.rs:25-33).

Env: BENCH_BATCH, BENCH_REPS, BENCH_MODE (hybrid|xla),
BENCH_SCOPE=two_boards for the old single-scene headline.

Args: ``--assert-min=X`` exits non-zero when the headline geomean drops
below X fps — the perf-regression gate (mirrors the reference wiring its
benches into cargo's harness, /root/reference/Cargo.toml:47-53). Run it
after a lever lands: ``python bench.py --assert-min=380`` (10 % under
the last recorded 424.68 exact geomean, BENCH_r03.json).

Hardware parity gate (default ON; ``BENCH_PARITY=0`` disables): every
benched image's warm-up output — exact AND turbo modes — is checked on
the actual backend against the NumPy oracle (the reference-exact twin,
tests/test_detector.rs:25-33 strengthened per BASELINE.json): tag-ID
sets must be EQUAL and every corner within 0.1 px. The two bundled
images the reference does not bench (top_right, calib_sample) get a
parity-only pass. Each JSON line carries ``corner_max_px`` and a final
``parity max corner error`` line summarizes; any violation exits 3.
This closes the round-4 gap where the CPU pytest suite runs Pallas in
interpret mode and a Mosaic-lowering regression could ship a green
round (the AG_EXTRACT=matmul incident: interpret-identical, hardware
not)."""

import json
import math
import os
import sys
import time

import numpy as np

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


def _wait_for_backend(deadline_s: float = 900.0) -> bool:
    """The axon relay can be down (today: HTTP up but every jax client
    hangs in backend registration — CLAUDE.md). `import jax` then hangs
    THIS process forever, so probe in a SUBPROCESS with a timeout and
    poll until the deadline. Returns False if the backend never came
    up — the caller emits a failure JSON line instead of hanging the
    driver's bench step."""
    import subprocess

    t0 = time.time()
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np, jax.numpy as jnp;"
                 "np.asarray((jnp.ones((8,128))+1)[0,0])"],
                timeout=120, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() - t0 > deadline_s:
            return False
        print("# backend probe failed; retrying...", file=sys.stderr,
              flush=True)
        time.sleep(30)


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    if not _wait_for_backend():
        print(json.dumps({
            "metric": "detect() bench skipped: jax backend unreachable "
            "(axon relay down; see CLAUDE.md)",
            "value": 0.0, "unit": "fps/chip", "vs_baseline": 0.0,
        }))
        return 1
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from aprilgrid_tpu.detector import TagDetector
    from aprilgrid_tpu.oracle.numpy_ref import load_image

    # BENCH_MODE=xla benchmarks the whole-pipeline-in-one-jit mode (the
    # multi-chip shardable path); default is the hybrid flagship
    mode = os.environ.get("BENCH_MODE", "hybrid")
    default_batch = "128" if mode == "hybrid" else "16"
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    # best-of-7: consecutive same-code runs swing +/-15 % through the
    # relay; more draws tighten the max estimator at ~seconds of cost
    reps = int(os.environ.get("BENCH_REPS", "7"))
    scope = os.environ.get("BENCH_SCOPE", "geomean")
    # BENCH_DECIMATE=1: the approximate "turbo" mode (half-res detect +
    # full-res corner re-refine) with the "auto" policy — >= 2 MP frames
    # decimate, smaller frames stay exact, so every golden count still
    # holds (tests/test_decimate.py pins the policy)
    decimate = os.environ.get("BENCH_DECIMATE", "0") not in ("0", "")

    det = TagDetector(
        "t36h11", mode=mode, decimate="auto" if decimate else False
    )
    mode = f"{mode}+turbo" if decimate else mode
    images = IMAGES if scope == "geomean" else [("two_boards", 72)]

    # Relay-weather gauge: the fixed dispatch+sync round-trip latency of
    # a tiny op. Healthy windows measure ~25-30 ms; congested windows
    # 2x+ that, and EVERY fps number in this run scales with it (the
    # hybrid pipeline pays several round trips per chunk). Recorded so a
    # cross-round comparison can tell code regressions from bad relay
    # windows (measured swing round 5: geomean 452 -> 355 on identical
    # code as the floor doubled).
    tiny = jnp.zeros((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(f_tiny(tiny)[0, 0])
    floors = []
    for _ in range(7):
        t0 = time.time()
        np.asarray(f_tiny(tiny)[0, 0])
        floors.append(time.time() - t0)
    print(json.dumps({
        "metric": "relay dispatch+sync floor (tiny op round trip; "
        "window-health gauge — fps lines scale inversely with it)",
        "value": round(1e3 * sorted(floors)[len(floors) // 2], 2),
        "unit": "ms", "vs_baseline": 1.0,
    }), flush=True)

    # -- hardware parity gate vs the NumPy oracle (reference-exact twin)
    parity_on = os.environ.get("BENCH_PARITY", "1") not in ("0", "")
    oracle_cache: dict = {}
    parity_worst = {"err": 0.0, "where": None}
    parity_failures: list = []

    def oracle_detect(name):
        if name not in oracle_cache:
            from aprilgrid_tpu.oracle.numpy_ref import TagDetector as Oracle

            img = load_image(f"tests/data/{name}.png")
            oracle_cache[name] = Oracle("t36h11").detect(img)
        return oracle_cache[name]

    def check_parity(name, label, out0):
        """IDs equal + corners < 0.1 px vs the oracle, on the REAL
        backend output. Records the worst error; returns it for the
        JSON line (None when the gate is off)."""
        if not parity_on:
            return None
        ref = oracle_detect(name)
        if set(out0) != set(ref):
            parity_failures.append(
                f"{label}: tag-ID set mismatch (missing "
                f"{sorted(set(ref) - set(out0))[:8]}, extra "
                f"{sorted(set(out0) - set(ref))[:8]})"
            )
            parity_worst.update(err=999.0, where=label)
            return 999.0  # sentinel: ID-set mismatch (JSON-safe)
        err = 0.0
        for tid, ref_corners in ref.items():
            d = np.abs(
                np.asarray(out0[tid], np.float64)
                - np.asarray(ref_corners, np.float64)
            ).max()
            err = max(err, float(d))
        if err >= 0.1:
            parity_failures.append(f"{label}: corner error {err:.4f} px")
        if err > parity_worst["err"]:
            parity_worst.update(err=err, where=label)
        return round(err, 6)

    def bench_one(name, expect, d=None, label=None):
        d = d or det
        img = load_image(f"tests/data/{name}.png")
        imgs = jnp.asarray(
            np.ascontiguousarray(np.broadcast_to(img, (batch,) + img.shape))
        )
        # warm up + correctness gate
        out = d.detect_batch(imgs)
        n_tags = len(out[0])
        assert n_tags == expect, f"{name}: expected {expect} tags, got {n_tags}"
        cerr = check_parity(name, label or name, out[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            d.detect_batch(imgs)
            best = min(best, time.time() - t0)
        return batch / best, n_tags, img.shape[:2], cerr

    fps_all = []
    for name, expect in images:
        # the relay tunnel occasionally drops a dispatch: one transient
        # failure must not zero the whole (one-shot) bench run
        last_err = None
        for attempt in range(3):
            try:
                fps, n_tags, (h, w), cerr = bench_one(name, expect)
                break
            except Exception as e:  # noqa: BLE001 — retried, then surfaced
                last_err = e
                print(f"# {name}: attempt {attempt + 1} failed: {e!r}",
                      file=sys.stderr, flush=True)
        else:
            print(f"# {name}: skipped after 3 failures: {last_err!r}",
                  file=sys.stderr, flush=True)
            continue
        fps_all.append(fps)
        line = {
            "metric": f"detect() {name} ({w}x{h}, {n_tags} tags, {mode})",
            "value": round(fps, 2),
            "unit": "fps/chip",
            "vs_baseline": round(fps / 2000.0, 4),
        }
        if cerr is not None:
            line["corner_max_px"] = cerr
        print(json.dumps(line), flush=True)

    if not fps_all:
        print(json.dumps({"metric": "detect() bench failed (all images)",
                          "value": 0.0, "unit": "fps/chip",
                          "vs_baseline": 0.0}))
        return 1

    # secondary info lines: the approximate turbo mode on the >= 2 MP
    # scenes (same tag IDs there — tests/test_decimate.py; sub-2MP
    # scenes stay exact under the auto policy, so they are not re-run)
    if scope == "geomean" and not decimate and mode == "hybrid":
        try:
            turbo_det = TagDetector("t36h11", mode="hybrid", decimate="auto")
            turbo_fps = {}
            for name, expect in [("iphone", 66), ("two_boards", 72)]:
                fps, n_tags, (h, w), cerr = bench_one(
                    name, expect, d=turbo_det, label=f"{name} (turbo)"
                )
                turbo_fps[name] = fps
                line = {
                    "metric": (
                        f"detect() {name} ({w}x{h}, {n_tags} tags, "
                        "hybrid+turbo — approx mode, IDs exact, "
                        "corners within 0.1 px of the reference)"
                    ),
                    "value": round(fps, 2),
                    "unit": "fps/chip",
                    "vs_baseline": round(fps / 2000.0, 4),
                }
                if cerr is not None:
                    line["corner_max_px"] = cerr
                print(json.dumps(line), flush=True)
            if len(fps_all) == len(images):
                # turbo-auto geomean: sub-2MP scenes stay EXACT under the
                # auto policy (same fps as above); only the two >= 2 MP
                # scenes change — no extra runs needed
                tf = [
                    turbo_fps.get(name, f)
                    for (name, _), f in zip(images, fps_all)
                ]
                tgeo = math.exp(sum(math.log(f) for f in tf) / len(tf))
                print(
                    json.dumps(
                        {
                            "metric": (
                                "detect() geomean fps, 7 golden images "
                                "(hybrid+turbo auto mode — all golden "
                                "counts hold)"
                            ),
                            "value": round(tgeo, 2),
                            "unit": "fps/chip",
                            "vs_baseline": round(tgeo / 2000.0, 4),
                        }
                    ),
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001 — info lines must not kill
            print(f"# turbo lines skipped: {e!r}", file=sys.stderr, flush=True)

    # honest-batch info line: one MIXED-scene batch per resolution class
    # (batches must be shape-uniform), cycling the golden scenes so the
    # native PairCache, branch predictors and jit dcap buckets see
    # DIFFERENT work per frame — 128 copies of one frame flatter all
    # three. Per-frame counts still assert against each frame's golden.
    if scope == "geomean" and not decimate and mode == "hybrid":
        try:
            for label, group in (
                ("mixed 1024x1024 (TUM_VI/right/r45/top)",
                 [("TUM_VI", 36), ("right", 36), ("r45", 36), ("top", 36)]),
                ("mixed 1920x1080 (iphone/two_boards)",
                 [("iphone", 66), ("two_boards", 72)]),
            ):
                frames = [
                    load_image(f"tests/data/{n}.png") for n, _ in group
                ]
                # RGB/gray mixes within a class share a layout already
                stack = np.stack(
                    [frames[i % len(frames)] for i in range(batch)]
                )
                imgs = jnp.asarray(stack)
                out = det.detect_batch(imgs)
                for i in range(min(len(group), batch)):
                    got, want = len(out[i]), group[i][1]
                    assert got == want, (
                        f"{label} frame {i} ({group[i][0]}): "
                        f"expected {want} tags, got {got}"
                    )
                best = float("inf")
                for _ in range(reps):
                    t0 = time.time()
                    det.detect_batch(imgs)
                    best = min(best, time.time() - t0)
                fps = batch / best
                print(
                    json.dumps(
                        {
                            "metric": f"detect() {label}, hybrid",
                            "value": round(fps, 2),
                            "unit": "fps/chip",
                            "vs_baseline": round(fps / 2000.0, 4),
                        }
                    ),
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001 — info lines must not kill
            print(f"# mixed-batch lines skipped: {e!r}",
                  file=sys.stderr, flush=True)
    # parity-only pass on the bundled images the reference does not
    # bench (top_right: 1024x1024 16-bit; calib_sample: BASELINE
    # config-1 frame) — sub-2 MP, so the turbo auto policy keeps them
    # exact and one exact-mode pass covers both modes
    if parity_on and scope == "geomean" and mode == "hybrid":
        for name, expect in [("top_right", 36), ("calib_sample", 36)]:
            try:
                img = load_image(f"tests/data/{name}.png")
                out = det.detect(img)
                assert len(out) == expect, (
                    f"{name}: expected {expect} tags, got {len(out)}"
                )
                cerr = check_parity(name, f"{name} (parity-only)", out)
                print(
                    json.dumps(
                        {
                            "metric": f"parity {name} (not benched "
                            "upstream; IDs + corners vs oracle)",
                            "value": float(len(out)),
                            "unit": "tags",
                            "vs_baseline": 1.0,
                            "corner_max_px": cerr,
                        }
                    ),
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — surfaced via gate
                parity_failures.append(f"{name} (parity-only): {e!r}")

    if parity_on:
        print(
            json.dumps(
                {
                    "metric": "parity max corner error vs NumPy oracle "
                    "(all images x exact+turbo, on this backend; "
                    "gate: IDs equal AND < 0.1 px)",
                    "value": round(parity_worst["err"], 6),
                    "unit": "px",
                    "vs_baseline": 1.0 if not parity_failures else 0.0,
                    "worst_at": parity_worst["where"],
                }
            ),
            flush=True,
        )

    geo = math.exp(sum(math.log(f) for f in fps_all) / len(fps_all))
    headline = (
        f"detect() geomean fps over the 7 golden images ({mode} mode)"
        if scope == "geomean"
        else f"detect() throughput, 1080p RGB (two_boards, 72 tags, {mode} mode)"
    )
    print(
        json.dumps(
            {
                "metric": headline,
                "value": round(geo, 2),
                "unit": "fps/chip",
                "vs_baseline": round(geo / 2000.0, 4),
            }
        )
    )
    # perf-regression gate: bench.py --assert-min=GEOMEAN fails the run
    # when the headline drops below the floor (use ~10 % under the last
    # recorded number so relay noise can't false-alarm)
    for arg in sys.argv[1:]:
        if arg.startswith("--assert-min="):
            floor = float(arg.split("=", 1)[1])
            if geo < floor:
                print(
                    f"# PERF REGRESSION: geomean {geo:.2f} < floor {floor}",
                    file=sys.stderr,
                )
                return 2
    if parity_failures:
        for f in parity_failures:
            print(f"# PARITY FAILURE: {f}", file=sys.stderr)
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
