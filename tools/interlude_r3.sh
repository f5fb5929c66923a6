#!/bin/bash
# Round-3 TPU interlude: the axon TPU serializes processes, so exclusive-TPU
# measurements must run between experiment fits. This watcher waits for the
# navier_stokes_abspos seed-1 fit to finish (DONE marker), stops the runner at
# the boundary (sacrificing only the first minutes of the seed-2 fit, which the
# restarted runner redoes), runs the queued measurements, and restarts
# tools/run_experiments_r3.sh (it skips DONE runs).
#
#   1. tools/kernel_profile.py        — VERDICT r2 #4: split-tile ILP variants
#   2. tools/train_backend_timing.py  — VERDICT r2 #1: first-order Pallas train path
#   3. tools/run_reference_baseline.py cahn_hilliard + navier_stokes —
#      VERDICT r2 weak #3: measured reference numbers at this repo's budgets
#      (gated on the CPU smoke test having produced /tmp/ref_smoke.json)
cd /root/repo
log() { echo "[interlude $(date +%H:%M:%S)] $*"; }

# 1. Wait for the s1 boundary: DONE appears on clean exit, or (if s1 crashed
#    without DONE) the s2 fit process appears.
while true; do
  [ -f outputs/r3/navier_stokes_abspos_s1/DONE ] && { log "s1 DONE"; break; }
  ps -eo args | grep -v grep | grep "enf_pde_tpu.experiments.fit" | grep -q "navier_stokes_abspos_s2" \
    && { log "s2 started (s1 ended without DONE)"; break; }
  sleep 20
done

# 2. Stop the runner shell (its children survive), then the young s2 fit by its
#    unique log_dir argument — a targeted pid, never a broad pattern-kill.
kill "$(cat /tmp/run_r3.pid)" 2>/dev/null
for i in $(seq 1 30); do
  pid=$(ps -eo pid,args | awk '/enf_pde_tpu.experiments.fit/ && /navier_stokes_abspos_s2/ {print $1; exit}')
  [ -n "$pid" ] && break
  sleep 5
done
if [ -n "$pid" ]; then
  log "killing s2 fit pid $pid"
  kill "$pid"
fi
while ps -eo args | grep -v grep | grep -q "enf_pde_tpu.experiments.fit"; do sleep 10; done
log "TPU free"

export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p results/r3 logs

log "kernel_profile (split/ILP variants)"
timeout 2400 python tools/kernel_profile.py baseline-512 split-2 split-4 split-2-tile-1024 blockdiag-mixer \
  > results/r3/kernel_profile_r3b.txt 2>&1
log "train_backend_timing (first-order Pallas vs XLA)"
timeout 2400 python tools/train_backend_timing.py navier_stokes_nonmaml \
  dataset.num_signals_train=16 dataset.num_signals_test=4 \
  > results/r3/train_backend_timing.json 2>&1

if [ -f /tmp/ref_smoke.json ]; then
  log "reference baseline: cahn_hilliard s0"
  timeout 9000 python tools/run_reference_baseline.py cahn_hilliard --seed 0 \
    > logs/ref_baseline_ch_s0.log 2>&1
  log "reference baseline: navier_stokes s0"
  timeout 9000 python tools/run_reference_baseline.py navier_stokes --seed 0 \
    > logs/ref_baseline_ns_s0.log 2>&1
else
  log "skip reference baselines (CPU smoke test not green yet)"
fi

log "restarting experiment runner"
rm -f /tmp/pause_r3
nohup bash tools/run_experiments_r3.sh > logs/run_r3.log 2>&1 &
echo $! > /tmp/run_r3.pid
log "interlude complete, runner pid $(cat /tmp/run_r3.pid)"
