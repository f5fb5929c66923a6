#!/bin/bash
# Controlled same-chip speed head-to-head: this repo's trainer vs the reference
# trainer on cahn_hilliard at the identical r3 budget, 12 epochs each, isolation
# (run only while the experiment runner is paused and no other TPU process runs).
#
# Ours logs per-epoch wall clock in metrics.jsonl ("t" field + step_time_s);
# the reference baseline driver timestamps its captured wandb stream ("_t").
# Compare nef-phase ms/step (epochs 3-7, post-compile) and ode-phase (epochs
# 9-12). Results feed the BASELINE.md speed rows.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
log() { echo "[h2h $(date +%H:%M:%S)] $*"; }

log "ours: cahn_hilliard 12 epochs (7 nef / 5 ode), no val"
timeout 2400 python -m enf_pde_tpu.experiments.fit cahn_hilliard \
  seed=0 logging.checkpoint=false dataset.path=data/ \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  dataset.batch_size=4 training.max_num_sampled_points=1024 \
  training.num_epochs=12 training.nef.train_until_epoch=7 training.ode.train_from_epoch=7 \
  test.test_interval=12 test.test_dp_interval=9999 logging.visualize_every_n_epochs=9999 \
  logging.log_every_n_steps=16 logging.log_dir=/tmp/h2h_ours \
  > logs/h2h_ours.log 2>&1
log "ours exit=$?"

log "reference: cahn_hilliard 12 epochs (same split via --epochs scaling)"
timeout 2400 python tools/run_reference_baseline.py cahn_hilliard --seed 0 \
  --epochs 12 --out /tmp/h2h_ref.json > logs/h2h_ref.log 2>&1
log "reference exit=$?"
log "head-to-head done; analyze with tools/headtohead_report.py"
