#!/bin/bash
# Detached tunnel watcher: probe the axon TPU every 5 min; the first time it
# answers, fire the serialized round-4 on-chip queue exactly once.
#   setsid nohup bash scripts/tpu_watch.sh > /tmp/tpu_watch.log 2>&1 &
# Marker files: /tmp/onchip_r4.started (queue fired), /tmp/tpu_watch.last
# (timestamped probe results for a human/agent to read).
cd "$(dirname "$0")/.."
while true; do
  if [ -f /tmp/onchip_r4.started ]; then
    echo "$(date -u +%FT%TZ) queue already fired; watcher exiting"
    exit 0
  fi
  if timeout 50 python -c "import jax; print(jax.devices())" > /tmp/tpu_probe.out 2>&1; then
    echo "$(date -u +%FT%TZ) TPU UP: $(cat /tmp/tpu_probe.out)" | tee -a /tmp/tpu_watch.last
    touch /tmp/onchip_r4.started
    bash scripts/onchip_round4.sh > /tmp/onchip_r4.log 2>&1
    echo "$(date -u +%FT%TZ) onchip_round4.sh finished rc=$?" | tee -a /tmp/tpu_watch.last
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tpu down" >> /tmp/tpu_watch.last
  sleep 300
done
