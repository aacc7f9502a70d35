#!/bin/bash
# Round-4 hardware A/B ladder (docs/ROADMAP.md "Ranked next steps").
# Runs the queued knob comparisons that landed CPU-green during relay
# outages.  Usage:  nohup bash tools/bench_ladder.sh > /tmp/ladder.log 2>&1 &
#
# Edit the numbered steps each round to match the ROADMAP's open levers.
# Round-4 queue (session 2):
#   1. background-search overlap worker A/B (AG_SEARCH_ASYNC=0 vs 1) on
#      the two multi-pass 1080p scenes — the 17:51 commit's only
#      hardware run hit a dying relay (geomean 267 vs 417 baseline)
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

run "1a overlap worker ON (iphone+two_boards attribution)" 560 \
  env BENCH_REPS=4 python tools/probe_iphone.py

run "1b overlap worker OFF (inline-search baseline)" 560 \
  env AG_SEARCH_ASYNC=0 BENCH_REPS=4 python tools/probe_iphone.py

# Final: full geomean, unbounded (cold compiles take minutes per HLO),
# gated at ~10 % under the last recorded exact geomean (r4 session-2: 452.07)
run "F full geomean + regression gate" 0 \
  python bench.py --assert-min=405

step "done"
