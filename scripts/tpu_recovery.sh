#!/bin/bash
# Run when the TPU tunnel returns (ss -tln shows :8083 etc).
# 1) fill the cts-free garble programs, 2) mark bench ready, 3) run the bench.
set -e
cd "$(dirname "$0")/.."
for i in $(seq 1 50); do
  echo "=== nocts pass $i $(date -u +%H:%M:%S) ===" >> /tmp/precompile_nocts.log
  timeout 10800 python scripts/precompile_aot_group.py 32 .gplan_k6_uniform_1048576.pkl garble_nocts >> /tmp/precompile_nocts.log 2>&1 || true
  grep -q "precompile complete (0 failed)" /tmp/precompile_nocts.log && break
  sleep 5
done
touch .bench_full_ready
python examples/bench_groth16_garble_group.py 32 2>&1 | tee /tmp/bench_full.log
