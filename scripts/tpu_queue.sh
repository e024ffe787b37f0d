#!/bin/bash
# Probe the TPU; when attachable, run the queued measurements once:
# official bench.py (warm line for the driver) and the 640M Q=4096 sweep.
# Writes results to /tmp/tpu_queue.log; a stamp file prevents re-runs.
set -u
STAMP=/tmp/tpu_queue.done
LOG=/tmp/tpu_queue.log
[ -e "$STAMP" ] && exit 0
cd /root/repo
if ! timeout 180 python -c "import jax; d=jax.devices(); assert d[0].platform in ('tpu','axon')" 2>/dev/null; then
  echo "$(date +%H:%M) tpu down" >> "$LOG"
  exit 1
fi
echo "$(date +%H:%M) tpu UP - running queue" >> "$LOG"
touch "$STAMP"
timeout 1200 python bench.py >> "$LOG" 2>&1
RB3TPU_AB_DIR=/root/repo/.bench/big640 RB3TPU_AB_UNROLL=2 \
  timeout 2400 python scripts/pack_ab.py 4096 4096 64 3 >> "$LOG" 2>&1
RB3TPU_AB_DIR=/root/repo/.bench/big640 RB3TPU_AB_UNROLL=2 \
  timeout 2400 python scripts/pack_ab.py 2048 4096 64 3 >> "$LOG" 2>&1
echo "$(date +%H:%M) queue done" >> "$LOG"
