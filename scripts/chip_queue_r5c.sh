#!/bin/bash
# Round-5 phase 3 (this session): the sandbox restart wiped /tmp including
# the compile cache, so phase-2's "warm re-run" plan restarts from cold —
# now against the repo-local .jax_cache that survives reboots.
#   1. warmup: default quality config, 4000 iters (covers every densify
#      growth shape + the eval shape) -> cache warmer, artifact discarded.
#   2. warm 7k default -> QUALITY_r05.json (the honest framework wall).
#   3. real-photo end-to-end -> QUALITY_r05_real.json (VERDICT r4 item 5).
#   4. warm 7k mcmc -> QUALITY_r05_mcmc.json (cold kept as *_cold).
#   5. final bench warm-up so the driver's `python bench.py` hits a warm
#      cache with the committed defaults.
# Launch: nohup bash scripts/chip_queue_r5c.sh > /tmp/chip_queue_r5c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "=== chip_queue_r5c start $(date) ==="

echo "--- warmup quality_bench default 4000 $(date) ---"
python scripts/quality_bench.py --iters 4000 --out /tmp/QUALITY_warmup.json

echo "--- warm quality_bench default 7000 $(date) ---"
cp -f QUALITY_r05.json QUALITY_r05_cold.json 2>/dev/null || true
python scripts/quality_bench.py --iters 7000 --out QUALITY_r05.json

echo "--- quality_real $(date) ---"
python scripts/quality_real.py --iters 4000 --out QUALITY_r05_real.json

echo "--- warm quality_bench mcmc cap=65536 $(date) ---"
cp -f QUALITY_r05_mcmc.json QUALITY_r05_mcmc_cold.json 2>/dev/null || true
python scripts/quality_bench.py --iters 7000 --densify-strategy mcmc \
  --capacity 65536 --out QUALITY_r05_mcmc.json

echo "--- final bench $(date) ---"
python bench.py

echo "=== chip_queue_r5c done $(date) ==="
