#!/bin/bash
# Restart wrapper for the evaluate-mode group-program cache fill.
cd "$(dirname "$0")/.."
B="${1:-32}"
LOG="${2:-/tmp/precompile_group_eval.log}"
for i in $(seq 1 300); do
  echo "=== eval pass $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 10800 python scripts/precompile_aot_group.py "$B" .gplan_k6_uniform_1048576.pkl evaluate >> "$LOG" 2>&1
  if grep -q "precompile complete (0 failed)" "$LOG"; then
    echo "=== DONE after pass $i ===" >> "$LOG"
    break
  fi
  sleep 5
done
