#!/bin/bash
# Round-5 session-2 hardware ladder (docs/ROADMAP.md "Ranked next steps").
# Runs the round-5 measurements queued behind the session-1 relay outage.
# Usage:  nohup bash tools/bench_ladder.sh > /tmp/ladder.log 2>&1 &
#
# Queue:
#   1. per-frame budget table (verdict item 1 prerequisite)
#   2. turbo extraction A/B: AG_TURBO_NMS=0 vs 1, back-to-back, b128
#      (re-confirm the static selector's 1-core choice on hardware)
#   3. xla-mode stage attribution at b16 (verdict item 2)
#   4. 4K multi-camera re-measure (verdict item 4)
#   F. full bench.py geomean + parity gate — NO timeout (cold HLOs
#      take minutes each; a killed headline run must never be silent)
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

step "0 wait for relay"
for i in $(seq 1 240); do
  if curl -m 3 -s -o /dev/null http://127.0.0.1:8093/; then echo "relay up"; break; fi
  sleep 30
done
curl -m 3 -s -o /dev/null http://127.0.0.1:8093/ || { echo "relay still down, aborting"; exit 1; }

run "1 budget table (two_boards iphone, b128)" 0 \
  python tools/probe_budget.py two_boards iphone

run "2a turbo drain (AG_TURBO_NMS=0) iphone+two_boards" 900 \
  env AG_TURBO_NMS=0 BENCH_DECIMATE=1 BENCH_BATCH=128 BENCH_REPS=4 \
  python tools/probe_iphone.py

run "2b turbo NMS (AG_TURBO_NMS=1) iphone+two_boards" 900 \
  env AG_TURBO_NMS=1 BENCH_DECIMATE=1 BENCH_BATCH=128 BENCH_REPS=4 \
  python tools/probe_iphone.py

run "3 xla attribution (iphone, b16)" 0 \
  python tools/probe_xla.py iphone

run "4 4K multi-camera" 0 \
  python tools/bench_4k.py

# Final: full geomean + parity, unbounded; regression gate ~10 % under
# the last recorded exact geomean (r4 session-2 ladder: 452.07)
run "F full geomean + parity + regression gate" 0 \
  python bench.py --assert-min=405

step "done"
