#!/bin/bash
# Round-3/4 hardware A/B ladder (docs/ROADMAP.md "Ranked next steps" #0/#1).
# Runs the queued knob comparisons that landed CPU-green during the relay
# outage.  Usage:  nohup bash tools/bench_ladder.sh > /tmp/ladder.log 2>&1 &
#
# Steps:
#   0. wait for the axon relay
#   1. tools/probe_mosaic.py           — lowering probes for the matmul extraction
#   2. probe_cluster drain vs matmul (mslots 8/16), b64 two_boards
#   3. AG_TILEH 64 vs 128              — exact front kernel, two_boards scope
#   4. turbo: AG_TILEH 64 vs 128 + AG_CHUNK 32/48/64, b128 two_boards
#   5. full bench.py geomean (current defaults)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

step() { echo; echo "=== $(date +%T) $* ==="; }

step "0 wait for relay"
for i in $(seq 1 240); do
  if curl -m 3 -s -o /dev/null http://127.0.0.1:8093/; then echo "relay up"; break; fi
  sleep 30
done
curl -m 3 -s -o /dev/null http://127.0.0.1:8093/ || { echo "relay still down, aborting"; exit 1; }

step "1 probe_mosaic"
timeout 560 python tools/probe_mosaic.py

step "2a probe_cluster extract=drain b64"
timeout 560 env BENCH_BATCH=64 AG_EXTRACT=drain python tools/probe_cluster.py
step "2b probe_cluster extract=matmul mslots=8 b64"
timeout 560 env BENCH_BATCH=64 AG_EXTRACT=matmul AG_MSLOTS=8 python tools/probe_cluster.py
step "2c probe_cluster extract=matmul mslots=16 b64"
timeout 560 env BENCH_BATCH=64 AG_EXTRACT=matmul AG_MSLOTS=16 python tools/probe_cluster.py

step "3a exact two_boards AG_TILEH=64 (baseline)"
timeout 560 env BENCH_SCOPE=two_boards BENCH_REPS=6 AG_TILEH=64 python bench.py
step "3b exact two_boards AG_TILEH=128"
timeout 560 env BENCH_SCOPE=two_boards BENCH_REPS=6 AG_TILEH=128 python bench.py

step "4a turbo two_boards chunk=default tileh=64"
timeout 560 env BENCH_SCOPE=two_boards BENCH_DECIMATE=1 BENCH_REPS=6 python bench.py
step "4b turbo two_boards chunk=48"
timeout 560 env BENCH_SCOPE=two_boards BENCH_DECIMATE=1 BENCH_REPS=6 AG_CHUNK=48 python bench.py
step "4c turbo two_boards chunk=64"
timeout 560 env BENCH_SCOPE=two_boards BENCH_DECIMATE=1 BENCH_REPS=6 AG_CHUNK=64 python bench.py
step "4d turbo two_boards chunk=48 tileh=128"
timeout 560 env BENCH_SCOPE=two_boards BENCH_DECIMATE=1 BENCH_REPS=6 AG_CHUNK=48 AG_TILEH=128 python bench.py

step "5 full geomean (current defaults)"
timeout 560 python bench.py

step "done"
