#!/bin/bash
# Round-5 chip work queue: every pending on-chip artifact in one sequential
# pass. Launch with:
#   nohup bash scripts/chip_queue_r5.sh > /tmp/chip_queue_r5.log 2>&1 &
# and POLL the log — never SIGTERM a TPU-bound process (NOTES.md Gotchas).
set -u
cd "$(dirname "$0")/.."

echo "=== chip_queue_r5 start $(date) ==="

python - <<'EOF' || { echo "PROBE FAILED - abort"; exit 1; }
import jax, jax.numpy as jnp
print("probe:", jax.device_get(jnp.ones(3).sum()), jax.devices())
EOF

# 1. Default quality run (eval hygiene + compile cache + warm budgets).
echo "--- quality_bench default $(date) ---"
python scripts/quality_bench.py --iters 7000 --out QUALITY_r05.json

# 2. MCMC with tuned (smaller) capacity: pay-its-wall-cost trial.
echo "--- quality_bench mcmc cap=65536 $(date) ---"
python scripts/quality_bench.py --iters 7000 --densify-strategy mcmc \
  --capacity 65536 --out QUALITY_r05_mcmc.json

# 3. Antialiased with multi-scale held-out eval (fair trial).
echo "--- quality_bench aa multiscale $(date) ---"
python scripts/quality_bench.py --iters 7000 --antialiased \
  --eval-scales 0.5,0.25 --out QUALITY_r05_aa.json

# 3b. non-AA multi-scale reference arm (same scales, same scene).
echo "--- quality_bench noaa multiscale $(date) ---"
python scripts/quality_bench.py --iters 7000 \
  --eval-scales 0.5,0.25 --out QUALITY_r05_noaa_ms.json

# 4. Real-photo end-to-end (production COLMAP path + sparse_interp depth).
echo "--- quality_real $(date) ---"
python scripts/quality_real.py --iters 4000 --out QUALITY_r05_real.json

# 5. Diffusion prior training + few-view A/B.
echo "--- train_diffusion_prior $(date) ---"
python scripts/train_diffusion_prior.py --out-dir /tmp/diffusion_prior
echo "--- diffusion_ab $(date) ---"
python scripts/diffusion_ab.py --prior-dir /tmp/diffusion_prior \
  --out DIFFUSION_AB_r05.json

# 6. Headline bench last (warm cache; the driver re-runs it after).
echo "--- bench $(date) ---"
python bench.py

echo "=== chip_queue_r5 done $(date) ==="
