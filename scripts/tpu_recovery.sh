#!/bin/bash
# Run when the TPU tunnel returns (ss -tln shows :8083 etc).
# Priority chain, each step restartable:
#   1) fill the cts-free garble programs for the grouped plan at the
#      bench.py filename (.gplan_k6_uniform_1048576.pkl — since r3 this
#      holds the seg-v2 low-padding plan; rebuild with
#      GSV_SEG_V2=1 scripts/build_gplan.py 6 1048576)
#   2) mark bench.py's full path ready + record the headline number
#   3) fill evaluate-mode programs (2PC/evaluate benches)
# NOTE: .jit_cache/ does NOT survive machine resets between rounds —
# commit it to git (git add -f .jit_cache) after every fill milestone.
set -x
cd "$(dirname "$0")/.."

fill() {  # fill <pkl> <mode> <log>
  local pass_log
  for i in $(seq 1 50); do
    pass_log="$3.pass"
    echo "=== $2 pass $i $(date -u +%H:%M:%S) ===" >> "$3"
    timeout 10800 python scripts/precompile_aot_group.py 32 "$1" "$2" > "$pass_log" 2>&1 || true
    cat "$pass_log" >> "$3"
    # judge success on THIS pass's output only (a stale success line in the
    # cumulative log from a prior plan at the same pickle name must not count)
    grep -q "precompile complete (0 failed)" "$pass_log" && return 0
    sleep 5
  done
  return 1
}

commit_cache() {  # commit_cache <msg>
  git add -f .jit_cache && git commit -q -m "$1" -- .jit_cache
}

fill .gplan_k6_uniform_1048576.pkl garble_nocts /tmp/precompile_nocts.log || exit 1
touch .bench_full_ready
commit_cache "Warm TPU compile cache: garble_nocts grouped programs"
python examples/bench_groth16_garble_group.py 32 2>&1 | tee /tmp/bench_full.log

fill .gplan_k6_uniform_1048576.pkl evaluate /tmp/precompile_eval.log || exit 1
commit_cache "Warm TPU compile cache: evaluate grouped programs"
