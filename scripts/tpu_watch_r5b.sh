#!/bin/bash
# Detached tunnel watcher (round-5 session B): probe the axon TPU every
# 5 min; the first time it answers, fire the serialized on-chip queue
# exactly once.
#   setsid nohup bash scripts/tpu_watch_r5b.sh > /tmp/tpu_watch_r5b.log 2>&1 &
# Markers: /tmp/onchip_r5b.started (queue fired), /tmp/tpu_watch.last
# (timestamped probe results for a human/agent to read).
cd "$(dirname "$0")/.."
while true; do
  if [ -f /tmp/onchip_r5b.started ]; then
    echo "$(date -u +%FT%TZ) queue already fired; watcher exiting"
    exit 0
  fi
  if timeout 50 python -c "import jax; print(jax.devices())" > /tmp/tpu_probe.out 2>&1; then
    echo "$(date -u +%FT%TZ) TPU UP: $(cat /tmp/tpu_probe.out)" | tee -a /tmp/tpu_watch.last
    touch /tmp/onchip_r5b.started
    bash scripts/onchip_round5b.sh > /tmp/onchip_r5b.log 2>&1
    echo "$(date -u +%FT%TZ) onchip_round5b.sh finished rc=$?" | tee -a /tmp/tpu_watch.last
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tpu down" >> /tmp/tpu_watch.last
  sleep 300
done
