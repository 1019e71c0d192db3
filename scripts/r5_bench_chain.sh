#!/bin/bash
# r5 headline chain: wm mega fill at the given top_k, then the honest bench.
# Usage: bash scripts/r5_bench_chain.sh [top_k] [B]
set -uo pipefail
cd "$(dirname "$0")/.."
K=${1:-24}
B=${2:-32}
V3=.gplan_k6_uniform_1048576_v3.pkl

echo "== wm mega warm fill (top_k=$K, B=$B)"
GSV_MEGA_EXPORT=0 GSV_HASHER=aes_wm GSV_MEGA_TOPK=$K \
  python scripts/warm_fill.py $B "$V3" mega || exit 1

echo "== bank the cache"
git add -f .jit_cache .mega_cache 2>/dev/null
git commit -q -m "Warm cache: wm mega top_k=$K fill" || true

echo "== honest full bench (wm mega)"
# BOTH sentinels: _wm_v3 selects the v3 plan + aes_wm hasher; _wm gates
# want_full (r5: missing the second one silently fell back to fq12)
touch .bench_full_ready_wm_v3 .bench_full_ready_wm
GSV_MEGA_EXPORT=0 GSV_MEGA_TOPK=$K GSV_BENCH_DEADLINE=7200 \
  python bench.py $B

echo "== bank post-bench cache entries"
git add -f .jit_cache .mega_cache BENCH_LAST.json .bench_full_ready_wm_v3 2>/dev/null
git commit -q -m "Warm cache: post-bench entries (wm mega top_k=$K)" || true
echo "r5_bench_chain done"
