#!/bin/bash
# Takeover chain replacing interlude8's tail (interlude8's shell was stopped to
# avoid double-launching interlude7 while the flagship instance PID was alive):
# (a) fill the diffusion_plane cache to the 64/16 signals the r2 rows used (the
#     ref baseline harness found only 32 cached), CPU-side, concurrent-safe;
# (b) wait for the in-flight ref shallow_water s2 baseline and the IHC flagship
#     (interlude7) to release the chip;
# (c) run the ref diff_plane baselines s0-2 (the last missing family head-to-head);
# (d) rerun interlude7_r3.sh if the flagship still lacks its DONE marker (one
#     more resume beyond its internal 2 attempts).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }
waitpid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done }

JAX_PLATFORMS=cpu python -m enf_pde_tpu.data.generate diffusion_plane \
  --path data/ --group train --count 64 >> outputs/pregen.log 2>&1
JAX_PLATFORMS=cpu python -m enf_pde_tpu.data.generate diffusion_plane \
  --path data/ --group test --count 16 >> outputs/pregen.log 2>&1
echo "diff_plane cache filled $(date)"

waitpid "${SW_PID:-12738}"
waitpid "${IL7_PID:-32041}"

for seed in 0 1 2; do
  hold
  if [ ! -f results/r3/reference_baseline_diff_plane_s${seed}.json ]; then
    timeout 3600 python tools/run_reference_baseline.py diff_plane --seed ${seed} \
      || echo "--- ref diff_plane s${seed} failed"
  fi
done

hold
if [ ! -f outputs/r3/ihc_full_s0/DONE ]; then
  bash tools/interlude7_r3.sh >> outputs/interlude7.log 2>&1
fi
echo INTERLUDE9_DONE $(date)
