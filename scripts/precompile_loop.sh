#!/bin/bash
# Restart loop around precompile_verifier.py: the warmer exits when RSS grows
# too large (axon client leak, see CLAUDE.md); rerun until it prints
# "precompile complete". Log to /root/repo/precompile.log.
cd /root/repo
for i in $(seq 1 200); do
  echo "=== precompile pass $i $(date -u +%H:%M:%S) ===" >> precompile.log
  python scripts/precompile_verifier.py "${1:-16}" "${2:-1048576}" "${3:-garble}" >> precompile.log 2>&1
  if tail -5 precompile.log | grep -q "precompile complete"; then
    echo "=== done ===" >> precompile.log
    break
  fi
  sleep 5
done
