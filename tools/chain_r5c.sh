#!/bin/bash
# Keep the round-5c queue alive: restart it if its process dies before printing
# QUEUE_R5C_DONE (skip logic makes restarts idempotent). Never starts a second
# queue: waits for the current queue PID to exit first.
set -u
cd /root/repo
LOG=outputs/queue_r4.log
while true; do
  sleep 120
  qpid=$(cat /tmp/queue_r4.pid 2>/dev/null || echo "")
  if [ -n "$qpid" ] && kill -0 "$qpid" 2>/dev/null; then continue; fi
  grep -q QUEUE_R5C_DONE "$LOG" 2>/dev/null && exit 0
  echo "[chain] queue pid gone without QUEUE_R5C_DONE — restarting queue_r5c $(date +%H:%M:%S)" >> "$LOG"
  nohup bash tools/queue_r5c.sh >> "$LOG" 2>&1 &
  sleep 300
done
