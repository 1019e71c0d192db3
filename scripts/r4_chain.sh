#!/bin/bash
# Round-4 chip chain: bank an honest v2-config number, then move the
# headline to the seg-v3 plan + fully fused Pallas hasher (aes_pallas2).
#
#  1) probe words_fused2 on chip (Mosaic in-kernel transpose sanity + rate)
#  2) fill garble_nocts@32 for (v3 plan, aes_pallas2) — own cache namespace
#  3) headline bench on the v3 plan; write sentinels + flip default pickle
#  4) fill evaluate@32 (protocol flows)
# Restartable; safe to re-run.  Commit .jit_cache after every milestone.
set -x
cd "$(dirname "$0")/.."

PKL_V3=.gplan_k6_uniform_1048576_v3.pkl

probe() {
  timeout 180 python -c "import jax; jax.devices(); print('TPU_OK')" 2>/dev/null \
    | grep -q TPU_OK
}

fill() {  # fill <mode> <log>
  local pass_log
  for i in $(seq 1 50); do
    pass_log="$2.pass"
    echo "=== $1 pass $i $(date -u +%H:%M:%S) ===" >> "$2"
    GSV_HASHER=aes_pallas timeout 10800 \
      python scripts/warm_fill.py 32 "$PKL_V3" "$1" > "$pass_log" 2>&1 || true
    cat "$pass_log" >> "$2"
    grep -q "warm fill complete" "$pass_log" && return 0
    probe || { echo "tunnel died mid-fill; waiting" >> "$2"; until probe; do sleep 240; done; }
    sleep 5
  done
  return 1
}

commit_cache() {
  git add -f .jit_cache "$PKL_V3" 2>/dev/null
  git commit -q -m "$1" -- .jit_cache "$PKL_V3" 2>/dev/null || git commit -q -m "$1" -- .jit_cache
}

until probe; do echo "$(date -u +%H:%M) TPU down" >> /tmp/tpu_watch.log; sleep 240; done

# 1) pallas2 on-chip probe (small, ~2 min)
if [ ! -f /tmp/probe_fused2.done ]; then
  timeout 2400 python scripts/probe_aes_pallas.py 4194304 > /tmp/probe_fused2.log 2>&1
  touch /tmp/probe_fused2.done
fi

# 2) v3 + pallas2 garble fill
[ -f "$PKL_V3" ] || { echo "missing $PKL_V3 — run build_gplan with GSV_SEG_V3=1"; exit 1; }
fill garble_nocts /tmp/precompile_v3_pallas2.log || exit 1
commit_cache "Warm TPU compile cache: seg-v3 plan, aes_pallas garble_nocts@32"

# 3) bench on the v3 plan (per-pass JSON; generous deadline)
touch .bench_full_ready_pallas_v3
GSV_GPLAN="$PKL_V3" GSV_BENCH_DEADLINE=7200 timeout 7200 \
  python bench.py 32 --hasher=aes_pallas --full 2>&1 | tee /tmp/bench_v3_pallas2.log

# 4) evaluate fill for the protocol flows
fill evaluate /tmp/precompile_v3_eval.log || exit 1
commit_cache "Warm TPU compile cache: seg-v3 plan, aes_pallas evaluate@32"
