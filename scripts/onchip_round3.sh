#!/bin/bash
# Serialized on-chip round-3 measurement queue (ONE TPU tenant at a time).
# Run from the repo root when the tunnel is healthy:
#   setsid nohup bash scripts/onchip_round3.sh > /tmp/onchip_r3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

echo "=== [1/4] e2e inference CLI drive (verify) ==="
rm -rf /tmp/v/out
timeout 3000 python -m stableavatar_tpu.cli.inference \
  --validation_reference_path /tmp/v/ref.png \
  --validation_driven_audio_path /tmp/v/voice.wav \
  --validation_prompts "A person is talking" \
  --sample_steps 2 --width 512 --height 512 \
  --fast_path linears --output_dir /tmp/v/out
ls -la /tmp/v/out || echo "E2E DRIVE FAILED"

echo "=== [2/4] bench.py (full) ==="
timeout 3000 python bench.py | tee /tmp/bench_r3.json

echo "=== [3/4] train step smoke (49f@256, 8-bit adam) ==="
timeout 1500 python scripts/train_tpu_smoke.py 49 256

echo "=== [4/4] decode overlap confirm ==="
timeout 900 python scripts/bench_decode_overlap.py --reps 2

echo "=== all done ==="
