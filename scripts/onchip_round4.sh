#!/bin/bash
# Serialized on-chip round-4 measurement queue (ONE TPU tenant at a time).
# Run from the repo root the moment the tunnel is healthy:
#   setsid nohup bash scripts/onchip_round4.sh > /tmp/onchip_r4.log 2>&1 &
# Probe first: timeout 50 python -c "import jax; print(jax.devices())"
set -x
cd "$(dirname "$0")/.."

mkdir -p /tmp/v
python - <<'EOF'
import os
import numpy as np, cv2, wave
os.makedirs("/tmp/v", exist_ok=True)
img = np.random.default_rng(0).uniform(0,255,(300,300,3)).astype(np.uint8)
cv2.imwrite("/tmp/v/ref.png", img)
t = np.arange(16000*14//10)/16000
w = (0.3*np.sin(2*np.pi*220*t)).astype(np.float32)
with wave.open("/tmp/v/voice.wav","wb") as f:
    f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
    f.writeframes((w*32767).astype(np.int16).tobytes())
EOF

echo "=== [1/5] e2e inference CLI drive (verify; streaming output) ==="
rm -rf /tmp/v/out
timeout 3000 python -m stableavatar_tpu.cli.inference \
  --validation_reference_path /tmp/v/ref.png \
  --validation_driven_audio_path /tmp/v/voice.wav \
  --validation_prompts "A person is talking" \
  --sample_steps 2 --width 512 --height 512 \
  --fast_path linears --stream_output --output_dir /tmp/v/out
ls -la /tmp/v/out || echo "E2E DRIVE FAILED"

echo "=== [2/5] bench.py (full: euler-50 + unipc-25 + teacache) ==="
timeout 3600 python bench.py | tee /tmp/bench_r4.json

echo "=== [3/5] train step smoke (49f@256, 8-bit adam) ==="
timeout 1500 python scripts/train_tpu_smoke.py 49 256

echo "=== [4/5] decode overlap confirm ==="
timeout 900 python scripts/bench_decode_overlap.py --reps 2

echo "=== [5/5] remaining step levers (measure-only; adopt if a win) ==="
# bf16-path bq sweep at the VMEM limit (NEXT.md item 3)
timeout 1200 python scripts/bench_attn_blocks.py || echo "bq sweep skipped"

echo "=== all done: fold /tmp/bench_r4.json into README + docs/PERF.md ==="
