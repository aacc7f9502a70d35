"""Streamed-ingest bench: detect() throughput INCLUDING host->device
uploads, serial vs pipelined (``parallel.streaming.detect_stream``).

The headline bench (bench.py) times device-resident frames because the
axon relay moves bulk data at only ~40 MB/s — two orders of magnitude
below a real TPU host's PCIe/DMA path — so ingest would swamp every
other number. This tool measures that ingest path explicitly:

  serial   : upload batch -> detect -> upload -> detect ...
  streamed : detect_stream with prefetch=2 (async device_put uploads
             overlap the in-flight detect)

On real hardware the streamed number should approach the device-resident
bench; on the relay it exposes the transfer floor instead (reported
honestly in MB/s). One JSON line per mode plus the overlap gain.

Run: python tools/bench_stream.py   (env: BENCH_BATCH, BENCH_NBATCH,
BENCH_IMG)
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

from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import load_image
from aprilgrid_tpu.parallel.streaming import detect_stream

GOLDEN = {"EuRoC": 36, "TUM_VI": 36, "right": 36, "r45": 36, "top": 36,
          "iphone": 66, "two_boards": 72}


def main() -> int:
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_batches = int(os.environ.get("BENCH_NBATCH", "6"))
    name = os.environ.get("BENCH_IMG", "two_boards")
    det = TagDetector("t36h11")

    img = load_image(f"tests/data/{name}.png")
    host = np.ascontiguousarray(np.broadcast_to(img, (batch,) + img.shape))
    frames = batch * n_batches
    mbytes = host.nbytes * n_batches / 1e6

    # warm up device path + jit specializations (and the correctness gate)
    out = det.detect_batch(host)
    assert len(out[0]) == GOLDEN[name], (name, len(out[0]))

    # serial: upload blocks, then detect
    t0 = time.time()
    for _ in range(n_batches):
        det.detect_batch(jax.device_put(host))
    t_serial = time.time() - t0

    # streamed: prefetch=2 keeps uploads in flight behind detect
    t0 = time.time()
    for _ in detect_stream(det, (host for _ in range(n_batches))):
        pass
    t_stream = time.time() - t0

    h, w = img.shape[:2]
    for label, t in (("serial", t_serial), ("streamed", t_stream)):
        print(json.dumps({
            "metric": f"ingest+detect {name} ({w}x{h}) {label}",
            "value": round(frames / t, 2),
            "unit": "fps/chip",
            "vs_baseline": round(frames / t / 2000.0, 4),
        }), flush=True)
    print(json.dumps({
        "metric": f"stream overlap gain ({name}); ingest "
                  f"{mbytes / t_serial:.0f} MB/s serial",
        "value": round(t_serial / t_stream, 3),
        "unit": "x",
        "vs_baseline": 0.0,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
