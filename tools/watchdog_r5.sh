#!/bin/bash
# TPU-tunnel wedge watchdog for the round-4 chip queue.
#
# Failure mode observed 2026-08-19 ~17:45: the axon remote-TPU tunnel silently
# wedged mid-run; the fit process slept on the RPC socket for 40+ minutes with
# no progress (ns1024_s0 attempt 1). Runs log to outputs/queue_r4.log every few
# seconds (per-epoch lines / tqdm), and all heavy val-suite shapes hit the
# persistent compile cache, so >30 min of log silence while a fit/baseline
# process is alive means a wedge, not a compile.
#
# Recovery: kill the queue's in-flight python. Resume-capable runs (ns1024,
# ihc_full, sw_full) restart from their last checkpoint on the queue's retry
# attempt; non-resumable reference baselines lose the run but free the chip for
# the next stage (logged loudly either way).
#
# PID discovery walks the process tree DOWN from /tmp/queue_r4.pid
# (queue bash -> timeout -> python) — never by command-line pattern.
set -u
cd /root/repo
LOG=outputs/queue_r4.log
THRESH=1800

while true; do
  sleep 300
  qpid=$(cat /tmp/queue_r4.pid 2>/dev/null) || continue
  kill -0 "$qpid" 2>/dev/null || continue   # queue turnover (r5 -> r5b): keep watching the pid file
  # deepest descendant chain: queue bash -> (timeout ->) python
  pid=$qpid
  for _ in 1 2 3; do
    child=$(pgrep -P "$pid" | head -1) || break
    [ -n "${child:-}" ] || break
    pid=$child
  done
  [ "$pid" != "$qpid" ] || continue           # queue idle (hold/sleep), nothing in flight
  comm=$(cat /proc/$pid/comm 2>/dev/null) || continue
  case "$comm" in python*) ;; *) continue ;; esac
  age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
  if [ "$age" -gt "$THRESH" ]; then
    echo "[watchdog] $(date +%H:%M:%S) log silent ${age}s with live fit pid $pid — killing (wedged tunnel)" | tee -a "$LOG"
    kill "$pid"; sleep 15
    kill -0 "$pid" 2>/dev/null && kill -9 "$pid"
  fi
done
