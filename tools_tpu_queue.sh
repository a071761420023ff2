#!/bin/bash
# Serial TPU job queue: pops the first line of /tmp/tpu_queue.txt and runs it
# (one JAX process at a time — the chip is single-tenant through the tunnel).
# Append jobs with:  echo "<shell command>" >> /tmp/tpu_queue.txt
# Stop after the current job:  rm /tmp/tpu_queue.txt
set -u
cd "$(dirname "$0")"
QUEUE=/tmp/tpu_queue.txt
while [ -f "$QUEUE" ]; do
  JOB=$(head -1 "$QUEUE")
  if [ -z "$JOB" ]; then
    # blank first line: queue drained or padding — trim and idle briefly
    tail -n +2 "$QUEUE" > "$QUEUE.tmp" && mv "$QUEUE.tmp" "$QUEUE"
    [ -s "$QUEUE" ] || sleep 20
    continue
  fi
  tail -n +2 "$QUEUE" > "$QUEUE.tmp" && mv "$QUEUE.tmp" "$QUEUE"
  echo "=== $(date -u +%H:%M:%S) queue job: $JOB" >> /tmp/tpu_queue.log
  bash -c "$JOB" >> /tmp/tpu_queue.log 2>&1
  echo "=== $(date -u +%H:%M:%S) job rc=$? : $JOB" >> /tmp/tpu_queue.log
done
echo "=== $(date -u +%H:%M:%S) queue file gone; exiting" >> /tmp/tpu_queue.log
