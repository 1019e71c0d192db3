#!/bin/bash
# Restart wrapper for precompile_verifier.py: the warmer leaks ~1GB RSS per
# warmed signature (axon client host mirrors), so it self-exits when RSS gets
# high and we restart it; already-cached signatures fly through on re-runs.
# Stops when the warmer prints "precompile complete".
cd "$(dirname "$0")/.."
B="${1:-16}"
LOG="${2:-/tmp/precompile.log}"
for i in $(seq 1 200); do
  echo "=== precompile pass $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 10800 python scripts/precompile_verifier.py "$B" >> "$LOG" 2>&1
  if grep -q "precompile complete" "$LOG"; then
    echo "=== DONE after pass $i ===" >> "$LOG"
    break
  fi
  sleep 5
done
