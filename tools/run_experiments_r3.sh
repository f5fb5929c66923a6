#!/bin/bash
# Round-3 measurement runs (sequential; the relayed TPU platform allows one process
# at a time). Three blocks:
#
#   A. Seed-matrix completion at the *round-2 documented budgets* (so seeds {1,2}
#      aggregate with the round-2 seed-0 rows): diff_sphere s2, both abs_pos
#      ablations s1-2, nonmaml s1-2, shallow_water s1-2.
#   B. navier_stokes_full: the EXACT reference protocol (16/16 signals, batch 8,
#      2000 epochs, nef 0-400 / ode 400-2000, test_interval 100 — reference
#      config_navier_stokes.yaml:23-86), seeds {0,1,2}.
#   C. ihc64: the scaled IHC dataset (64 train / 16 test ball-convection
#      trajectories), seeds {0,1,2}. Requires the background generation to have
#      finished (the loader generates missing trajectories itself otherwise).
#
# All runs decode validation/rollout with the fused Pallas kernel
# (nef.eval_backend: pallas is now the config default).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
run() {
  local tag=$1; shift
  for seed in $SEEDS; do
    local dir=outputs/r3/${tag}_s${seed}
    if [ -f ${dir}/DONE ]; then echo "skip ${tag}_s${seed}"; continue; fi
    # Cooperative pause point: `touch /tmp/pause_r3` lets another task borrow the
    # TPU between fits (the axon platform serializes processes); rm to resume.
    while [ -f /tmp/pause_r3 ]; do echo "paused $(date +%H:%M:%S)"; sleep 60; done
    echo "=== ${tag} seed ${seed} $(date +%H:%M:%S) ==="
    timeout 10800 python -m enf_pde_tpu.experiments.fit "$@" seed=${seed} \
      logging.log_dir=${dir} dataset.path=data/ \
      && touch ${dir}/DONE
  done
}

# ---------------------------------------------------------------- A: seed matrix
# cahn_hilliard s2's round-2 run died at epoch 111 before final validation (the
# SUMMARY/EXPERIMENTS seed-count discrepancy in VERDICT r2 #8) — rerun it complete.
export SEEDS="2"
run cahn_hilliard cahn_hilliard logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  dataset.batch_size=4 training.max_num_sampled_points=1024 \
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  logging.log_every_n_steps=400

run diff_sphere diff_sphere logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  test.test_equiv_at_epoch=100 logging.log_every_n_steps=400

export SEEDS="1 2"
run diff_sphere_abspos diff_sphere nef.invariant_type=abs_pos logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
  test.test_interval=150 test.test_dp_interval=150 logging.log_every_n_steps=400

run navier_stokes_abspos navier_stokes nef.invariant_type=abs_pos logging.checkpoint=false \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=400 training.nef.train_until_epoch=240 training.ode.train_from_epoch=240 \
  test.test_interval=400 test.test_dp_interval=400 test.test_equiv_at_epoch=9999 \
  logging.log_every_n_steps=800

run navier_stokes_nonmaml navier_stokes_nonmaml logging.checkpoint=false \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=300 training.nef.train_until_epoch=200 training.ode.train_from_epoch=200 \
  test.test_interval=300 test.refit_epochs=50 logging.log_every_n_steps=800

run shallow_water shallow_water logging.checkpoint=false \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=250 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=250 test.test_dp_interval=250 logging.visualize_every_n_epochs=250 \
  test.test_equiv_at_epoch=200 logging.log_every_n_steps=400

# ------------------------------------------- B: full-budget reference-protocol NS
export SEEDS="0 1 2"
run navier_stokes_full navier_stokes \
  dataset.num_signals_train=16 dataset.num_signals_test=16 \
  training.num_epochs=2000 training.nef.train_until_epoch=400 training.ode.train_from_epoch=400 \
  test.test_interval=100 test.test_dp_interval=500 test.test_equiv_at_epoch=400 \
  logging.visualize_every_n_epochs=1000 logging.log_every_n_steps=200 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

# -------------------------------------------------------- C: scaled IHC (64/16)
export SEEDS="0 1 2"
run ihc64 ihc logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  test.test_equiv_at_epoch=100 logging.log_every_n_steps=400

echo ALL_RUNS_DONE $(date)
