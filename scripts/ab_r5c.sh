#!/bin/bash
# Round-5 follow-up A/B: ab_r5_perf.sh showed split2 scans are +10%
# (4.383 vs 3.97 Msplats/s) and grad_reduce=mxu is -10% (loses to scatter
# at every pairing). The missing cells: split2 + exact-moments on the
# WINNING scatter reduce, and a chunk sweep on the winner.
#   nohup bash scripts/ab_r5c.sh > /tmp/ab_r5c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== env=$1 args=$2 $(date) ==="
  env $1 python bench.py --iters 20 --headline-only $2
}

run "TINYSPLAT_SCAN_PRECISION=split2 TINYSPLAT_EXACT_MOMENTS=1" ""
run "TINYSPLAT_SCAN_PRECISION=split2" "--chunk 256"
run "TINYSPLAT_SCAN_PRECISION=split2" "--tile-x 32"
echo "=== done $(date) ==="
