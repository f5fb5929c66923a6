#!/bin/bash
# Round-3 TPU interlude #3: extend the measured reference-baseline matrix
# (BASELINE.md "run the reference configs and record", VERDICT r2 weak #3).
# Runs after interlude2 (which holds the TPU for the CH s0 + NS s0 baselines):
#   1. diff_sphere reference baseline — smoke, then full s0 (adds a curved
#      geometry to the measured rows; coords fixed to this repo's (phi, theta)
#      loader grid).
#   2. cahn_hilliard reference baselines s1, s2 — makes the CH reference row a
#      3-seed mean +- std, directly comparable to this repo's 3-seed row.
# then resumes the experiment runner (tools/run_experiments_r3.sh).
cd /root/repo
log() { echo "[interlude3 $(date +%H:%M:%S)] $*"; }
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
rm -f /tmp/ref_smoke_tpu_ns.json /tmp/ref_smoke_tpu_ds.json

INTERLUDE2_PID=$(cat /tmp/interlude2.pid 2>/dev/null)
if [ -n "$INTERLUDE2_PID" ]; then
  log "waiting for interlude2 (pid $INTERLUDE2_PID) to finish"
  while kill -0 "$INTERLUDE2_PID" 2>/dev/null; do sleep 5; done
fi
# Re-claim the TPU before the runner wakes from its 60 s pause-check sleep.
touch /tmp/pause_r3
log "pause flag set"
# If the runner won the race and started a fit, wait for it to drain.
while ps -eo args | grep -v grep | grep -q "enf_pde_tpu.experiments.fit"; do sleep 30; done
log "TPU free"

log "reference baseline TPU smoke: navier_stokes (retry — empty-val-loader fix)"
timeout 1800 python tools/run_reference_baseline.py navier_stokes --seed 0 \
  --epochs 1 --signals 8 --out /tmp/ref_smoke_tpu_ns.json > logs/ref_smoke_tpu_ns.log 2>&1
if [ -f /tmp/ref_smoke_tpu_ns.json ]; then
  log "NS smoke ok — full navier_stokes s0"
  timeout 10000 python tools/run_reference_baseline.py navier_stokes --seed 0 \
    > logs/ref_baseline_ns_s0.log 2>&1
  log "NS baseline exit=$?"
else
  log "NS smoke FAILED again — skipping full run"
fi

log "reference baseline TPU smoke: diff_sphere"
timeout 1800 python tools/run_reference_baseline.py diff_sphere --seed 0 \
  --epochs 1 --signals 8 --out /tmp/ref_smoke_tpu_ds.json > logs/ref_smoke_tpu_ds.log 2>&1
if [ -f /tmp/ref_smoke_tpu_ds.json ]; then
  log "DS smoke ok — full diff_sphere s0"
  timeout 10000 python tools/run_reference_baseline.py diff_sphere --seed 0 \
    > logs/ref_baseline_ds_s0.log 2>&1
  log "DS baseline exit=$?"
else
  log "DS smoke FAILED — skipping full run"
fi

for seed in 1 2; do
  log "full cahn_hilliard s${seed}"
  timeout 10000 python tools/run_reference_baseline.py cahn_hilliard --seed ${seed} \
    > logs/ref_baseline_ch_s${seed}.log 2>&1
  log "CH s${seed} exit=$?"
done

log "resuming runner"
rm -f /tmp/pause_r3
log "interlude3 complete"
