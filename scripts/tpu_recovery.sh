#!/bin/bash
# TPU recovery chain (restartable; safe to re-run any time).
# 0) wait for the tunnel backend to answer a trivial op
# 1) prefix diagnostic on the existing (unpacked) compile cache — measures
#    per-dispatch overhead with device syncs (docs/perf-model.md r3)
# 2) fill the PACKED garble_nocts programs (GSV_PACKED_SEGS=1 — ~9x lower
#    per-dispatch marshaling; needs its own compile fill)
# 3) mark bench.py's full+packed path ready, run the headline bench
# 4) fill packed evaluate-mode programs (2PC / cut-and-choose flows)
# NOTE: commit .jit_cache to git after every fill milestone — nothing
# outside git survives a round boundary.
set -x
cd "$(dirname "$0")/.."

PKL=.gplan_k6_uniform_1048576.pkl

probe() {
  timeout 180 python -c "import jax; jax.devices(); print('TPU_OK')" 2>/dev/null \
    | grep -q TPU_OK
}

fill() {  # fill <mode> <log> (packed)
  local pass_log
  for i in $(seq 1 50); do
    pass_log="$2.pass"
    echo "=== $1 pass $i $(date -u +%H:%M:%S) ===" >> "$2"
    GSV_PACKED_SEGS=1 timeout 10800 \
      python scripts/precompile_aot_group.py 32 "$PKL" "$1" > "$pass_log" 2>&1 || true
    cat "$pass_log" >> "$2"
    # judge success on THIS pass's output only
    grep -q "precompile complete (0 failed)" "$pass_log" && return 0
    probe || { echo "tunnel died mid-fill; back to waiting" >> "$2"; until probe; do sleep 240; done; }
    sleep 5
  done
  return 1
}

commit_cache() {
  git add -f .jit_cache && git commit -q -m "$1" -- .jit_cache
}

until probe; do echo "$(date -u +%H:%M) TPU down" >> /tmp/tpu_watch.log; sleep 240; done
echo "$(date -u +%H:%M) TPU UP" >> /tmp/tpu_watch.log

if [ ! -f /tmp/prefix_diag.done ]; then
  timeout 3600 python scripts/bench_plan_prefix.py 32 "$PKL" --sync=500 \
    --max-steps=4000 > /tmp/prefix_diag.log 2>&1
  touch /tmp/prefix_diag.done
fi

fill garble_nocts /tmp/precompile_packed.log || exit 1
touch .bench_packed_ready .bench_full_ready
commit_cache "Warm TPU compile cache: PACKED garble_nocts grouped programs"

GSV_PACKED_SEGS=1 timeout 7200 \
  python examples/bench_groth16_garble_group.py 32 2>&1 | tee /tmp/bench_full_packed.log

fill evaluate /tmp/precompile_eval_packed.log || exit 1
commit_cache "Warm TPU compile cache: PACKED evaluate grouped programs"
