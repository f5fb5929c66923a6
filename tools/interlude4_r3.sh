#!/bin/bash
# TPU idle-gap job (runner is blocked on PREGEN_IHC_DONE, ~4h of CPU generation):
# second seeds for the measured reference head-to-heads, so the "reference,
# measured" rows are not single-seed point estimates.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }

hold
if [ ! -f results/r3/reference_baseline_navier_stokes_full_s1.json ]; then
  timeout 5400 python tools/run_reference_baseline.py navier_stokes --seed 1 \
    --epochs 2000 --signals 16 --test-signals 16 --nef-until 400 \
    --out results/r3/reference_baseline_navier_stokes_full_s1.json \
    || echo "--- ref NS-full s1 failed"
fi
hold
if [ ! -f results/r3/reference_baseline_diff_sphere_s1.json ]; then
  timeout 3600 python tools/run_reference_baseline.py diff_sphere --seed 1 \
    || echo "--- ref diff_sphere s1 failed"
fi
hold
if [ ! -f results/r3/reference_baseline_cahn_hilliard_s1.json ]; then
  timeout 3600 python tools/run_reference_baseline.py cahn_hilliard --seed 1 \
    || echo "--- ref cahn_hilliard s1 failed"
fi
echo INTERLUDE4_DONE $(date)
