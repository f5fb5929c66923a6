#!/bin/bash
# Launch queue_r5b.sh once queue_r5.sh finishes (QUEUE_R5_DONE in the shared log).
# Never starts a second queue: waits for the current queue PID to exit first.
set -u
cd /root/repo
LOG=outputs/queue_r4.log
while true; do
  sleep 120
  qpid=$(cat /tmp/queue_r4.pid 2>/dev/null || echo "")
  if [ -n "$qpid" ] && kill -0 "$qpid" 2>/dev/null; then continue; fi
  # queue process gone — start r5b only if the main queue completed its stages
  if grep -q QUEUE_R5_DONE "$LOG" 2>/dev/null && ! grep -q QUEUE_R5B_DONE "$LOG" 2>/dev/null; then
    echo "[chain] starting queue_r5b $(date +%H:%M:%S)" >> "$LOG"
    nohup bash tools/queue_r5b.sh >> "$LOG" 2>&1 &
    exit 0
  fi
  # queue died without finishing: restart it (skip logic makes this idempotent)
  if ! grep -q QUEUE_R5_DONE "$LOG" 2>/dev/null; then
    echo "[chain] main queue pid gone without QUEUE_R5_DONE — restarting queue_r5 $(date +%H:%M:%S)" >> "$LOG"
    nohup bash tools/queue_r5.sh >> "$LOG" 2>&1 &
    sleep 300
  fi
done
