#!/bin/bash
# Serialized on-chip round-5 SESSION-B measurement queue (one TPU tenant at
# a time).  Fire the moment the tunnel is healthy:
#   setsid nohup bash scripts/onchip_round5b.sh > /tmp/onchip_r5b.log 2>&1 &
# Probe first: timeout 50 python -c "import jax; print(jax.devices())"
set -x
cd "$(dirname "$0")/.."

echo "=== [1/4] bench.py re-capture (fixed TeaCache skip-step estimator) ==="
timeout 1500 python bench.py > /tmp/bench_r5e.json 2>/tmp/bench_r5e.err
tail -1 /tmp/bench_r5e.json

echo "=== [2/4] quality curves + TeaCache frontier at 512^2 (solver-sensitized; VERDICT r4 items 5/6) ==="
timeout 5400 python scripts/quality_curves.py

echo "=== [3/4] 14B streamed (sequential-offload) window step on one 16GB chip ==="
timeout 2400 python scripts/probe_14b_streamed.py

echo "=== [4/4] cross-attn route confirm (two-XLA vs fused-pallas vs two-pallas) ==="
timeout 900 python scripts/bench_cross_route.py || echo "route confirm skipped"

echo "=== all done: fold results into README + docs/PERF.md + docs/QUALITY.md ==="
