#!/bin/bash
# Round-3 TPU gap #2: runs once the experiment runner reaches its cooperative
# pause point (/tmp/pause_r3 — see tools/run_experiments_r3.sh). Tasks, in order:
#   1. python bench.py                  — verifies the preemption prolog in anger
#                                         and refreshes the headline kernel numbers
#   2. verify-skill fast e2e drive      — 2-epoch diffusion_plane fit on the TPU
#   3. reference-baseline TPU smokes    — 1-epoch CH + NS sanity at tiny budget
#   4. full reference baselines         — CH s0, NS s0 (VERDICT r2 weak #3)
# then removes the pause file so the runner resumes the seed matrix.
cd /root/repo
log() { echo "[interlude2 $(date +%H:%M:%S)] $*"; }
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

# Wait for the in-flight fit to drain (runner then sits in its pause loop).
while ps -eo args | grep -v grep | grep -q "enf_pde_tpu.experiments.fit"; do sleep 30; done
log "TPU free (runner paused)"

log "bench.py"
timeout 3000 python bench.py > /tmp/bench_gap.json 2> /tmp/bench_gap.err
log "bench exit=$? $(cat /tmp/bench_gap.json)"

log "verify drive (2-epoch diffusion_plane)"
timeout 550 python -m enf_pde_tpu.experiments.fit diffusion_plane \
  dataset.num_signals_train=8 dataset.num_signals_test=4 dataset.batch_size=4 \
  training.num_epochs=2 training.nef.train_until_epoch=1 training.ode.train_from_epoch=1 \
  test.test_interval=2 test.test_dp_interval=9999 \
  nef.num_hidden=32 node.num_hidden=32 node.basis_dim=16 training.max_num_sampled_points=256 \
  logging.checkpoint=false logging.log_dir=/tmp/verify_run dataset.path=data/ \
  > logs/verify_drive.log 2>&1
log "verify drive exit=$?"

log "reference baseline TPU smoke: cahn_hilliard"
timeout 1800 python tools/run_reference_baseline.py cahn_hilliard --seed 0 \
  --epochs 1 --signals 8 --out /tmp/ref_smoke_tpu_ch.json > logs/ref_smoke_tpu_ch.log 2>&1
if [ -f /tmp/ref_smoke_tpu_ch.json ]; then
  log "CH smoke ok — full cahn_hilliard s0"
  timeout 10000 python tools/run_reference_baseline.py cahn_hilliard --seed 0 \
    > logs/ref_baseline_ch_s0.log 2>&1
  log "CH baseline exit=$?"
else
  log "CH smoke FAILED — skipping full run"
fi

log "reference baseline TPU smoke: navier_stokes"
timeout 1800 python tools/run_reference_baseline.py navier_stokes --seed 0 \
  --epochs 1 --signals 8 --out /tmp/ref_smoke_tpu_ns.json > logs/ref_smoke_tpu_ns.log 2>&1
if [ -f /tmp/ref_smoke_tpu_ns.json ]; then
  log "NS smoke ok — full navier_stokes s0"
  timeout 10000 python tools/run_reference_baseline.py navier_stokes --seed 0 \
    > logs/ref_baseline_ns_s0.log 2>&1
  log "NS baseline exit=$?"
else
  log "NS smoke FAILED — skipping full run"
fi

log "resuming runner"
rm -f /tmp/pause_r3
log "interlude2 complete"
