#!/bin/bash
# Round-3 chip work queue: run every pending on-chip measurement in one
# sequential pass once the axon relay is back. Launch with:
#   nohup bash scripts/chip_queue.sh > /tmp/chip_queue.log 2>&1 &
# and POLL the log — never SIGTERM a TPU-bound process (NOTES.md Gotchas).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue.log

echo "=== chip_queue start $(date) ==="

# 0. Cheap probe: is the chip actually usable (relay ports can be up while
#    the backend wedges)?
python - <<'EOF' || { echo "PROBE FAILED - abort"; exit 1; }
import jax, jax.numpy as jnp
print("probe:", jax.device_get(jnp.ones(3).sum()), jax.devices())
EOF

# 1. grad_reduce A/B at bench scale (winner becomes the default).
for gr in sorted segment scatter; do
  echo "--- bench grad_reduce=$gr $(date) ---"
  python bench.py --grad-reduce "$gr" --iters 20
done

# 2. tiles_per_block sweep with the sorted default.
for tpb in 4 8 16; do
  echo "--- bench tpb=$tpb $(date) ---"
  python bench.py --tpb "$tpb" --iters 20
done

# 3. Serialized per-op breakdown of the current pipeline (top ops).
echo "--- profile_bench $(date) ---"
python scripts/profile_bench.py --iters 3 --top 30

# 3b. bf16-window feasibility: does Mosaic lower the uint16 lane
#     reconstruction (variant D)? Gates NOTES' bf16-attr-window idea.
echo "--- probe_bf16_bitcast $(date) ---"
python scripts/probe_bf16_bitcast.py

# 4. Adversarial quality benchmark (VERDICT r2 item 3): GT via the tiled
#    XLA backend, random-cloud init, >=100k splats — ~35 min.
echo "--- quality_bench $(date) ---"
python scripts/quality_bench.py --iters 7000 --out QUALITY_r03.json
cat QUALITY_r03.json || true

echo "=== chip_queue done $(date) ==="
