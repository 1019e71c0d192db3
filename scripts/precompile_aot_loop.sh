#!/bin/bash
# Restart wrapper for precompile_aot.py (lower+compile only, no execution).
# The AOT walker self-exits if RSS climbs; cached signatures fly through on
# re-runs, so restarting is cheap (plan is pickled). Stops on "precompile
# complete".
cd "$(dirname "$0")/.."
B="${1:-16}"
LOG="${2:-/tmp/precompile_aot.log}"
for i in $(seq 1 300); do
  echo "=== aot pass $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 10800 python scripts/precompile_aot.py "$B" >> "$LOG" 2>&1
  if grep -q "precompile complete (0 failed)" "$LOG"; then
    echo "=== DONE after pass $i ===" >> "$LOG"
    break
  fi
  sleep 5
done
