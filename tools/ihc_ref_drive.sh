#!/bin/bash
# Self-watchdogged driver for the reference ihc_full seed-0 baseline.
#
# The axon tunnel wedged twice on 2026-08-20 (~09:57 and ~22:08) mid-run; the
# reference side has no resume (run_reference_baseline.py pins checkpoint=False),
# so each wedge restarts the run from epoch 0. This driver loops: probe the
# remote-compile path with a fresh-shape program, launch the baseline, kill and
# relaunch if the .partial metric sidecar goes silent for STALL seconds (steady
# state streams a record every epoch, ~5-6 s). On success (or after MAX_RUNS
# failures) it removes /tmp/pause_r4 so the held chip queue proceeds to its next
# stage either way.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
OUT=results/r3/reference_baseline_ihc_full_s0.json
SIDE=results/r3/reference_baseline_ihc_full_s0_log.jsonl.partial
STALL=${STALL:-1200}
MAX_RUNS=${MAX_RUNS:-4}

probe() {
  local d=$1
  timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones(($d, $((d+7)))); w = jnp.ones(($((d+7)), $((d+13))))
def f(a, b):
    for _ in range(4):
        a = a + 0.1 * (jnp.tanh(a @ b) @ b.T)
    return a
s = float(np.asarray(jnp.sum(jax.jit(f)(x, w))))
print(f'probe ok in {time.time()-t0:.1f}s sum={s:.3e}', flush=True)
" 2>&1 | grep -q "probe ok"
}

for runidx in $(seq 1 $MAX_RUNS); do
  [ -f "$OUT" ] && break
  ok=0
  for i in $(seq 1 10); do
    if probe $((640 + runidx * 29 + i)); then ok=1; break; fi
    echo "[drive] probe $i wedged $(date +%H:%M:%S); sleeping 240s"
    sleep 240
  done
  if [ $ok -ne 1 ]; then echo "[drive] tunnel never recovered; giving up"; break; fi
  echo "[drive] tunnel healthy; launching ihc ref run $runidx $(date +%H:%M:%S)"
  timeout 21600 python tools/run_reference_baseline.py ihc --seed 0 --out "$OUT" \
    --epochs 2000 --nef-until 500 --test-interval 250 --test-dp-interval 9999 &
  fitpid=$!
  while kill -0 $fitpid 2>/dev/null; do
    sleep 120
    age=$(( $(date +%s) - $(stat -c %Y "$SIDE" 2>/dev/null || date +%s) ))
    if [ $age -gt $STALL ]; then
      echo "[drive] sidecar silent ${age}s with live fit $fitpid — killing (wedge) $(date +%H:%M:%S)"
      kill $fitpid; sleep 15
      kill -0 $fitpid 2>/dev/null && kill -9 $fitpid
      break
    fi
  done
  wait $fitpid 2>/dev/null
  echo "[drive] run $runidx ended $(date +%H:%M:%S) (out present: $([ -f $OUT ] && echo yes || echo no))"
done

if [ -f "$OUT" ]; then
  git add -A results/r3 && git commit -q -m "chip queue: reference ihc_full seed 0 baseline (wedge-tolerant drive)" || true
  echo "[drive] SUCCESS $(date)"
else
  echo "[drive] FAILED after $MAX_RUNS runs; releasing the queue anyway $(date)"
fi
rm -f /tmp/pause_r4
