#!/bin/bash
# Round-5 phase 2 (run after chip_queue_r5.sh):
#   1. WARM re-runs of the default and mcmc quality benches — phase 1 ran
#      them against a cold compile cache (code changed since round 4), so
#      their minutes_to_27dB was compile-dominated (18.0 / 20.7 min against
#      ~14.5 / ~8 sustained steps/s). The warm wall is the honest framework
#      number; the cold artifacts are preserved as *_cold.json.
#   2. The kernel-perf A/B sweep (scripts/ab_r5_perf.sh inline).
# Launch: nohup bash scripts/chip_queue_r5b.sh > /tmp/chip_queue_r5b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "=== chip_queue_r5b start $(date) ==="

cp -f QUALITY_r05.json QUALITY_r05_cold.json 2>/dev/null || true
cp -f QUALITY_r05_mcmc.json QUALITY_r05_mcmc_cold.json 2>/dev/null || true

echo "--- warm quality_bench default $(date) ---"
python scripts/quality_bench.py --iters 7000 --out QUALITY_r05.json

echo "--- warm quality_bench mcmc cap=65536 $(date) ---"
python scripts/quality_bench.py --iters 7000 --densify-strategy mcmc \
  --capacity 65536 --out QUALITY_r05_mcmc.json

bash scripts/ab_r5_perf.sh

echo "=== chip_queue_r5b done $(date) ==="
