#!/bin/bash
# Round-2 measurement runs: all 7 experiments (+ abs_pos ablations + non-MAML),
# seeds {0,1,2}, documented reduced budgets (see EXPERIMENTS.md). Sequential — the
# relayed TPU platform allows one process at a time.
cd /root/repo
# Persistent compilation cache: seeds 1,2 of each config reuse seed 0's programs
# (fresh processes otherwise recompile ~15-20 min of validation programs each).
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
run() {
  local tag=$1; shift
  for seed in $SEEDS; do
    local dir=outputs/r2/${tag}_s${seed}
    if [ -f ${dir}/DONE ]; then echo "skip ${tag}_s${seed}"; continue; fi
    echo "=== ${tag} seed ${seed} $(date +%H:%M:%S) ==="
    timeout 7200 python -m enf_pde_tpu.experiments.fit "$@" seed=${seed} \
      logging.log_dir=${dir} logging.checkpoint=false dataset.path=data/ \
      && touch ${dir}/DONE
  done
}

for SEEDS in "0" "1 2"; do
export SEEDS

run diffusion_plane diffusion_plane \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=100 training.nef.train_until_epoch=60 training.ode.train_from_epoch=60 \
  test.test_interval=100 test.test_dp_interval=100 logging.visualize_every_n_epochs=100 \
  logging.log_every_n_steps=200

run navier_stokes navier_stokes \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=400 training.nef.train_until_epoch=240 training.ode.train_from_epoch=240 \
  test.test_interval=400 test.test_dp_interval=400 test.test_equiv_at_epoch=399 \
  logging.visualize_every_n_epochs=400 logging.log_every_n_steps=800

# CH second-order memory: batch 8 x fit_on_num_steps 3 x 2048 pts x 9 latents
# OOMs the 16G chip; halve batch and sampled points (documented budget reduction).
run cahn_hilliard cahn_hilliard \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  dataset.batch_size=4 training.max_num_sampled_points=1024 \
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  logging.log_every_n_steps=400

run diff_sphere diff_sphere \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  logging.log_every_n_steps=400

run shallow_water shallow_water \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=250 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=250 test.test_dp_interval=250 logging.visualize_every_n_epochs=250 \
  logging.log_every_n_steps=400

run ihc ihc \
  dataset.num_signals_train=16 dataset.num_signals_test=4 \
  training.num_epochs=150 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  logging.log_every_n_steps=400

run navier_stokes_abspos navier_stokes nef.invariant_type=abs_pos \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=400 training.nef.train_until_epoch=240 training.ode.train_from_epoch=240 \
  test.test_interval=400 test.test_dp_interval=400 test.test_equiv_at_epoch=9999 \
  logging.log_every_n_steps=800

run diff_sphere_abspos diff_sphere nef.invariant_type=abs_pos \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
  test.test_interval=150 test.test_dp_interval=150 logging.log_every_n_steps=400

run navier_stokes_nonmaml navier_stokes_nonmaml \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=300 training.nef.train_until_epoch=200 training.ode.train_from_epoch=200 \
  test.test_interval=300 test.refit_epochs=50 logging.log_every_n_steps=800

done  # SEEDS passes

echo ALL_RUNS_DONE $(date)
