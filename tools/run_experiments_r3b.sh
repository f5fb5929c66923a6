#!/bin/bash
# Round-3 continuation runner (fresh container: outputs/ DONE markers restored from
# results/r3 snapshots before launch). Remaining work from tools/run_experiments_r3.sh,
# re-ordered to follow data-cache regeneration (tools/pregen_r3b.sh):
#   1. navier_stokes_nonmaml s2        (completes the 3-seed non-MAML row)
#   2. reference-baseline NS s0        (reference trainer, same data/budget/chip)
#   3. navier_stokes_full s0           (reference-protocol full-budget flagship)
#   4. shallow_water s1, s2            (completes the 3-seed SW + super-res row)
#   5. reference-baseline diff_sphere  (same-budget head-to-head on S^2)
#   6. ihc64 s0, s1, s2                (scaled 64/16 ball-convection, 3 seeds)
#   7. navier_stokes_full s1, s2       (full-budget seed matrix, if time allows)
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

wait_for() {  # wait for a pregen stage marker so we don't race the CPU generator
  while [ ! -f "$1" ]; do sleep 30; done
}

run() {
  local tag=$1; shift
  for seed in $SEEDS; do
    local dir=outputs/r3/${tag}_s${seed}
    if [ -f ${dir}/DONE ]; then echo "skip ${tag}_s${seed}"; continue; fi
    while [ -f /tmp/pause_r3 ]; do echo "paused $(date +%H:%M:%S)"; sleep 60; done
    echo "=== ${tag} seed ${seed} $(date +%H:%M:%S) ==="
    # Two attempts: checkpointed runs resume from where the timeout killed them.
    for attempt in 1 2; do
      timeout 10800 python -m enf_pde_tpu.experiments.fit "$@" seed=${seed} \
        logging.log_dir=${dir} dataset.path=data/ \
        && touch ${dir}/DONE && break
      echo "--- ${tag}_s${seed} attempt ${attempt} did not finish"
    done
  done
}

wait_for outputs/PREGEN_NS_DONE

export SEEDS="2"
run navier_stokes_nonmaml navier_stokes_nonmaml logging.checkpoint=false \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=300 training.nef.train_until_epoch=200 training.ode.train_from_epoch=200 \
  test.test_interval=300 test.refit_epochs=50 logging.log_every_n_steps=800

# Same-budget reference head-to-head on NS (r2-row budget; writes
# results/r3/reference_baseline_navier_stokes_s0.json). Short-circuits if done.
if [ ! -f results/r3/reference_baseline_navier_stokes_s0.json ]; then
  timeout 10800 python tools/run_reference_baseline.py navier_stokes --seed 0 \
    || echo "--- reference baseline NS failed"
fi

export SEEDS="0"
run navier_stokes_full navier_stokes \
  dataset.num_signals_train=16 dataset.num_signals_test=16 \
  training.num_epochs=2000 training.nef.train_until_epoch=400 training.ode.train_from_epoch=400 \
  test.test_interval=100 test.test_dp_interval=500 test.test_equiv_at_epoch=400 \
  logging.visualize_every_n_epochs=1000 logging.log_every_n_steps=200 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

wait_for outputs/PREGEN_SW_DONE
export SEEDS="1 2"
run shallow_water shallow_water logging.checkpoint=false \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=250 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=250 test.test_dp_interval=250 logging.visualize_every_n_epochs=250 \
  test.test_equiv_at_epoch=200 logging.log_every_n_steps=400

# Same-budget reference head-to-head on S^2 (needs the regenerated diff_sphere
# cache — produced by the gated side job, marker outputs/PREGEN_DSPH_DONE).
if [ ! -f results/r3/reference_baseline_diff_sphere_s0.json ]; then
  wait_for outputs/PREGEN_DSPH_DONE
  timeout 10800 python tools/run_reference_baseline.py diff_sphere --seed 0 \
    || echo "--- reference baseline diff_sphere failed"
fi

wait_for outputs/PREGEN_IHC_DONE
export SEEDS="0 1 2"
run ihc64 ihc logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  test.test_equiv_at_epoch=100 logging.log_every_n_steps=400

export SEEDS="1 2"
run navier_stokes_full navier_stokes \
  dataset.num_signals_train=16 dataset.num_signals_test=16 \
  training.num_epochs=2000 training.nef.train_until_epoch=400 training.ode.train_from_epoch=400 \
  test.test_interval=100 test.test_dp_interval=500 test.test_equiv_at_epoch=400 \
  logging.visualize_every_n_epochs=1000 logging.log_every_n_steps=200 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

echo ALL_RUNS_DONE $(date)
