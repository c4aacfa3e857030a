#!/bin/bash
# Round-5 kernel-perf A/B queue (run AFTER chip_queue_r5.sh drains):
#   nohup bash scripts/ab_r5_perf.sh > /tmp/ab_r5_perf.log 2>&1 &
# Sweeps the two new levers against the round-5 baseline (3.95-3.98 Msplats/s):
#   - TINYSPLAT_SCAN_PRECISION: the in-kernel triangular scan matmuls run
#     HIGHEST (6 bf16 passes) on a P=256 measurement; at the bench's P=1024
#     the 2-pass split may win big (rasterize_pallas._SCAN_MODE).
#   - grad_reduce=mxu: Pallas one-hot-MXU segment sum replacing the 9.5 ms
#     per-index gradient scatter (rasterize_pallas._segsum_kernel).
# Short iters first so a bad config wastes little chip time.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== env=$1 args=$2 $(date) ==="
  env $1 python bench.py --iters 20 --headline-only $2
}

run TINYSPLAT_SCAN_PRECISION=split2 ""
run TINYSPLAT_SCAN_PRECISION=highest "--grad-reduce mxu"
run TINYSPLAT_EXACT_MOMENTS=1 ""
run "TINYSPLAT_SCAN_PRECISION=split2 TINYSPLAT_EXACT_MOMENTS=1" "--grad-reduce mxu"
run "TINYSPLAT_Q_VPU=1 TINYSPLAT_SCAN_PRECISION=split2 TINYSPLAT_EXACT_MOMENTS=1" "--grad-reduce mxu"
run "TINYSPLAT_SCAN_PRECISION=split2 TINYSPLAT_EXACT_MOMENTS=1" "--grad-reduce mxu --chunk 256"
echo "=== done $(date) ==="
