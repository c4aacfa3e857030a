#!/bin/bash
# Round-5 phase 4 (after chip_queue_r5c.sh drains):
#   1. diffusion few-view A/B on the chip with the in-sandbox-trained prior
#      (.diffusion_prior, eps-mse 0.0083) — closes SURVEY §2's two
#      "partial" diffusion components with efficacy evidence either way.
#   2. AA fair trial (VERDICT r4 item 7): multi-scale held-out eval,
#      non-AA arm first (training HLO == default -> warm), then AA.
# Launch: nohup bash scripts/chip_queue_r5d.sh > /tmp/chip_queue_r5d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "=== chip_queue_r5d start $(date) ==="

echo "--- diffusion_ab $(date) ---"
python scripts/diffusion_ab.py --prior-dir .diffusion_prior \
  --out DIFFUSION_AB_r05.json

echo "--- quality_real retry (background=black fix) $(date) ---"
python scripts/quality_real.py --iters 4000 --out QUALITY_r05_real.json

echo "--- quality_bench noaa multiscale $(date) ---"
python scripts/quality_bench.py --iters 7000 \
  --eval-scales 0.5,0.25 --out QUALITY_r05_noaa_ms.json

echo "--- quality_bench aa multiscale $(date) ---"
python scripts/quality_bench.py --iters 7000 --antialiased \
  --eval-scales 0.5,0.25 --out QUALITY_r05_aa.json

echo "--- bench refresh $(date) ---"
python bench.py

echo "=== chip_queue_r5d done $(date) ==="
