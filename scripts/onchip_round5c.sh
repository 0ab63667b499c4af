#!/bin/bash
# Round-5 session-B follow-up queue: run AFTER onchip_round5b.sh completes.
#   setsid nohup bash scripts/onchip_round5c.sh > /tmp/onchip_r5c2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== [1/2] static-bound softmax A/B inside the full DiT step ==="
timeout 1800 python scripts/bench_static_max.py

echo "=== [2/2] matched-quality vs TRUE-solution proxy (unipc-200 ref) ==="
QC_TRUE_REF=1 timeout 7200 python scripts/quality_curves.py

echo "=== done: fold results into docs/PERF.md + docs/QUALITY.md ==="
