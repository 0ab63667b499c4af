#!/bin/bash
# Serialized on-chip round-5 measurement queue (ONE TPU tenant at a time).
# Run from the repo root the moment the tunnel is healthy:
#   setsid nohup bash scripts/onchip_round5.sh > /tmp/onchip_r5.log 2>&1 &
# Probe first: timeout 50 python -c "import jax; print(jax.devices())"
set -x
cd "$(dirname "$0")/.."

echo "=== [1/4] bench.py (headline w/ XLA-routed cross-attn) ==="
timeout 1500 python bench.py | tee /tmp/bench_r5.json

echo "=== [2/4] quality curves + TeaCache frontier at 512^2 (VERDICT r4 items 5/6) ==="
timeout 3600 python scripts/quality_curves.py

echo "=== [3/4] 14B streamed (sequential-offload) window step on one 16GB chip ==="
timeout 2400 python scripts/probe_14b_streamed.py

echo "=== [4/4] cross-attn route confirm (two-XLA vs fused-pallas vs two-pallas) ==="
timeout 900 python scripts/bench_cross_fused.py || echo "route confirm skipped"

echo "=== all done: fold results into README + docs/PERF.md + docs/QUALITY.md ==="
