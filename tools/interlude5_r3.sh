#!/bin/bash
# Second TPU idle-gap job (after tools/interlude4_r3.sh): seed-2 reference
# baselines plus NS r3-budget seeds 1-2, making every measured head-to-head row
# a 3-seed vs 3-seed comparison. Yields the chip once the IHC data cache is
# complete (the ihc64 runner has priority for the rest of the round).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }
yield_if_runner_ready() {
  if [ -f outputs/PREGEN_IHC_DONE ]; then
    echo "INTERLUDE5_YIELDS (ihc64 runner has the chip) $(date)"; exit 0
  fi
}

for seed in 2; do
  hold; yield_if_runner_ready
  if [ ! -f results/r3/reference_baseline_navier_stokes_full_s${seed}.json ]; then
    timeout 5400 python tools/run_reference_baseline.py navier_stokes --seed ${seed} \
      --epochs 2000 --signals 16 --test-signals 16 --nef-until 400 \
      --out results/r3/reference_baseline_navier_stokes_full_s${seed}.json \
      || echo "--- ref NS-full s${seed} failed"
  fi
done
for seed in 2; do
  hold; yield_if_runner_ready
  if [ ! -f results/r3/reference_baseline_diff_sphere_s${seed}.json ]; then
    timeout 3600 python tools/run_reference_baseline.py diff_sphere --seed ${seed} \
      || echo "--- ref diff_sphere s${seed} failed"
  fi
done
for seed in 2; do
  hold; yield_if_runner_ready
  if [ ! -f results/r3/reference_baseline_cahn_hilliard_s${seed}.json ]; then
    timeout 3600 python tools/run_reference_baseline.py cahn_hilliard --seed ${seed} \
      || echo "--- ref cahn_hilliard s${seed} failed"
  fi
done
# NS at the r3 row budget (ref s0 took ~2180 s each; only if the gap allows).
for seed in 1 2; do
  hold; yield_if_runner_ready
  if [ ! -f results/r3/reference_baseline_navier_stokes_s${seed}.json ]; then
    timeout 5400 python tools/run_reference_baseline.py navier_stokes --seed ${seed} \
      || echo "--- ref NS s${seed} failed"
  fi
done
echo INTERLUDE5_DONE $(date)
