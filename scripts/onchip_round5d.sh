#!/bin/bash
# Round-5 session-C follow-up queue: run AFTER onchip_round5c.sh completes
# (one TPU tenant at a time; see memory: tpu-watcher-protocol).
#   setsid nohup bash scripts/onchip_round5d.sh > /tmp/onchip_r5d.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== [1/2] fresh driver-style bench (fused cross-attn adopted) ==="
timeout 1200 python bench.py

echo "=== [2/2] 14B streamed (sequential-offload) window step, cached compile ==="
timeout 3600 python scripts/probe_14b_streamed.py

echo "=== done: fold results into docs/PERF.md + docs/bench_r5_builder.json ==="
