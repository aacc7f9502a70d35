#!/bin/bash
# Round-5 session-2 ladder 3: re-measure after the host-path cuts
# (fast unpack, queue reorder, chunk default, -march=native) and the
# init_quads set compaction.
# Usage:  nohup bash tools/bench_ladder3.sh > /tmp/ladder3.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

step() { echo; echo "=== $(date +%T) $* ==="; }
run() {
  local label="$1" tmo="$2"; shift 2
  step "$label"
  if [ "$tmo" -gt 0 ]; then timeout "$tmo" "$@"; else "$@"; fi
  local rc=$?
  if [ $rc -eq 124 ]; then echo "!!! $label TIMED OUT (${tmo}s)";
  elif [ $rc -ne 0 ]; then echo "!!! $label FAILED rc=$rc"; fi
  return 0
}

run "1 timeline two_boards exact b128 (post-cuts)" 0 \
  python tools/probe_timeline.py two_boards

run "1b timeline iphone exact b128 (post-cuts)" 700 \
  python tools/probe_timeline.py iphone

run "2 xla re-measure (set-compacted init_quads)" 0 \
  python tools/probe_xla.py iphone

run "3 full geomean + parity (new baseline)" 0 \
  python bench.py --assert-min=380

run "4 4K multi-camera re-measure" 0 \
  python tools/bench_4k.py

step "done"
