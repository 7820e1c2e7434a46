#!/bin/bash
# One-shot TPU remeasurement for the round-2 session-2 changes.
# Run when the axon tunnel is back (probe first!):
#   timeout 120 python -c "import jax,jax.numpy as jnp; x=jnp.ones((8,8)); print(float((x@x).sum()))"
# Then:  bash scripts/tpu_remeasure.sh 2>&1 | tee /tmp/tpu_remeasure.log
#
# Measures, in order (each independently useful if the tunnel dies again):
#  1. bench.py headline (expect ~48k subg/s; the probe-fallback must NOT
#     trigger — check the platform field says the accelerator).
#  2. bf16 feature-table storage A/B at the flagship shape — the
#     deferred-upcast change (nn/model.py) should erase the 10% penalty
#     BENCH.md records for --feat_dtype bfloat16.
set -u
cd "$(dirname "$0")/.."

echo "=== [1/3] bench.py headline ==="
timeout 2400 python bench.py

echo "=== [2/3] flagship f32 feat storage (gat_bench preset) ==="
timeout 2400 python scripts/gat_bench.py --preset flagship_sage3 --aggr sage

echo "=== [3/3] flagship bf16 feat storage (deferred upcast) ==="
timeout 2400 python scripts/gat_bench.py --preset flagship_sage3 --aggr sage --feat_dtype bfloat16

echo "=== done — update BENCH.md 'bf16 feature-table storage' section ==="
