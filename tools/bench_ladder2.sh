#!/bin/bash
# Round-5 session-2 post-landing A/B queue. Run AFTER tools/bench_ladder.sh
# completes:  nohup bash tools/bench_ladder2.sh > /tmp/ladder2.log 2>&1 &
#
#   1. host-event timeline with the fused tail read (attribution)
#   2. chunk-size re-ladder, exact 1080p + 1024^2 (fused tail shifts it)
#   3. xla-mode re-measure after the width/byte restructures (+spg ladder)
#   4. (host-only, after TPU steps) C++ search -march=native A/B
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

run "1 timeline two_boards exact b128" 0 \
  python tools/probe_timeline.py two_boards

run "1b timeline iphone exact b128" 600 \
  python tools/probe_timeline.py iphone

run "2 chunk ladder exact (two_boards TUM_VI)" 0 \
  env CHUNKS=32,48,64 python tools/probe_chunk.py two_boards TUM_VI

run "3 xla re-measure + spg ladder (iphone b16)" 0 \
  env XSPG=1,3,6 python tools/probe_xla.py iphone

run "4 march=native search A/B (host-only)" 900 bash -c '
  env -u PALLAS_AXON_POOL_IPS python tools/profile_search.py iphone two_boards
  echo "--- AG_NATIVE_MARCH=native ---"
  env -u PALLAS_AXON_POOL_IPS AG_NATIVE_MARCH=native \
    python tools/profile_search.py iphone two_boards
  echo "--- restore portable build ---"
  env -u PALLAS_AXON_POOL_IPS python -c \
    "from aprilgrid_tpu import native; native.build(force=True)"
'

step "done"
