#!/bin/bash
# Pallas-hasher headline chain (restartable).
#  1) on-chip A/B probe: XLA vs Pallas AES rates (honest D2H sync)
#  2) fill garble_nocts@32 programs with GSV_HASHER=aes_pallas (own cache
#     namespace — different HLO than the XLA-hasher programs)
#  3) write the pallas sentinel, run the full-verifier bench with
#     --hasher=aes_pallas, commit cache + artifacts
set -x
cd "$(dirname "$0")/.."

PKL=.gplan_k6_uniform_1048576.pkl

probe() {
  timeout 180 python -c "import jax; jax.devices(); print('TPU_OK')" 2>/dev/null \
    | grep -q TPU_OK
}

fill() {  # fill <mode> <log>
  local pass_log="$2.pass"
  for i in $(seq 1 40); do
    echo "=== pallas $1 pass $i $(date -u +%H:%M:%S) ===" >> "$2"
    GSV_HASHER=aes_pallas timeout 10800 \
      python scripts/precompile_aot_group.py 32 "$PKL" "$1" > "$pass_log" 2>&1 || true
    cat "$pass_log" >> "$2"
    grep -q "precompile complete (0 failed)" "$pass_log" && return 0
    probe || { echo "tunnel gone; waiting" >> "$2"; until probe; do sleep 240; done; }
    sleep 5
  done
  return 1
}

until probe; do echo "$(date -u +%H:%M) TPU down" >> /tmp/tpu_watch.log; sleep 240; done

# fill FIRST (compile-only, no chip time — runs fine alongside a bench);
# the on-chip A/B probe runs afterwards, when the chip is free
fill garble_nocts /tmp/fill_pallas32.log || exit 1
touch .bench_full_ready_pallas
git add -f .jit_cache && git commit -q -m "Warm cache: pallas-hasher garble_nocts@32 programs" -- .jit_cache

# chip phases serialize on a mutex; also wait out the legacy XLA bench
while ps -o args= -C python,python3 2>/dev/null | grep -qE "bench\.py 32$|bench\.py 32 $"; do
  sleep 120
done
exec 9>/tmp/tpu_chip.lock
flock 9

if [ ! -f /tmp/pallas_probe.done ]; then
  timeout 1800 python scripts/probe_aes_pallas.py > /tmp/pallas_probe.log 2>&1
  touch /tmp/pallas_probe.done
fi

timeout 14400 python bench.py 32 --hasher=aes_pallas > /tmp/bench_pallas.log 2>&1
tail -1 /tmp/bench_pallas.log
echo "PALLAS CHAIN COMPLETE $(date -u)" >> /tmp/r3_chain.log
