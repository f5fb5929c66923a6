#!/bin/bash
# Final TPU job of round 3: the IHC (ball geometry) reference head-to-head —
# runs once the ihc64 seed matrix has the chip free. Completes the measured
# reference comparison across all geometry families (torus, S^2, B^3).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }

# Wait for the runner's last ihc64 seed (the chip is free afterwards: the
# queue's remaining navier_stokes_full seeds are already DONE and skip).
while [ ! -f outputs/r3/ihc64_s2/DONE ]; do sleep 120; done

# Re-run ihc64 s0: its original slot burned both attempts on the pre-fix
# kernel vmem OOM (see the tile-cap commit), so the runner advanced past it.
dir=outputs/r3/ihc64_s0
if [ ! -f ${dir}/DONE ]; then
  hold
  timeout 10800 python -m enf_pde_tpu.experiments.fit ihc seed=0 \
    logging.log_dir=${dir} dataset.path=data/ logging.checkpoint=false \
    dataset.num_signals_train=64 dataset.num_signals_test=16 \
    training.num_epochs=150 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
    test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
    test.test_equiv_at_epoch=100 logging.log_every_n_steps=400 \
    && touch ${dir}/DONE
fi

for seed in 0 1; do
  hold
  if [ ! -f results/r3/reference_baseline_ihc_s${seed}.json ]; then
    timeout 7200 python tools/run_reference_baseline.py ihc --seed ${seed} \
      || echo "--- ref ihc s${seed} failed"
  fi
done
echo INTERLUDE6_DONE $(date)
