#!/bin/bash
# Round-4 hardware A/B ladder (docs/ROADMAP.md "Ranked next steps").
# Runs the queued knob comparisons that landed CPU-green during relay
# outages.  Usage:  nohup bash tools/bench_ladder.sh > /tmp/ladder.log 2>&1 &
#
# Edit the numbered steps each round to match the ROADMAP's open levers.
# Round-4 queue:
#   1. iphone exact attribution (per-stage timeline, the 2x gap to the
#      device ceiling — VERDICT r3 item 2)
#   2. turbo clustering-free extraction A/B (VERDICT r3 item 1)
#   F. full bench.py geomean + regression gate — NO timeout (a cold jit
#      cache can take minutes per new HLO; a killed headline run must
#      never be silent)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

step() { echo; echo "=== $(date +%T) $* ==="; }
# run "label" timeout_s cmd... — logs TIMED OUT/FAILED visibly
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

run "1 iphone exact per-stage attribution" 560 \
  env BENCH_SCOPE=iphone BENCH_REPS=6 python tools/bench_detection.py

run "2a turbo two_boards (drain baseline)" 560 \
  env BENCH_SCOPE=two_boards BENCH_DECIMATE=1 BENCH_REPS=6 python bench.py
# 2b: clustering-free turbo extraction once it lands (AG_TURBO_NMS=1)

# Final: full geomean, unbounded (cold compiles take minutes per HLO),
# gated at 10 % under the last recorded exact geomean (BENCH_r03: 424.68)
run "F full geomean + regression gate" 0 \
  python bench.py --assert-min=380

step "done"
