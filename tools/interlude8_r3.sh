#!/bin/bash
# Chain after interlude6: (a) reference IHC baseline seed 2 so the B^3
# head-to-head is 3-seed-vs-3-seed like the NS/CH/diff_sphere rows, (b) the two
# remaining family head-to-heads — diff_plane (short) and shallow_water (incl.
# the reference's own zero-shot super-res validation protocol) — so every one
# of the 7 experiment families has a measured same-chip/same-data/same-budget
# reference comparison, then (c) the full-epoch-budget IHC flagship
# (interlude7 — checkpointed+resumable, so a round boundary doesn't lose it).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }

# Wait for interlude6 (ihc64 s0 rerun + ref ihc s0/s1) to release the chip.
while kill -0 "$(cat /tmp/interlude6.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done

hold
if [ ! -f results/r3/reference_baseline_ihc_s2.json ]; then
  timeout 7200 python tools/run_reference_baseline.py ihc --seed 2 \
    || echo "--- ref ihc s2 failed"
fi

for seed in 0 1 2; do
  hold
  if [ ! -f results/r3/reference_baseline_diff_plane_s${seed}.json ]; then
    timeout 3600 python tools/run_reference_baseline.py diff_plane --seed ${seed} \
      || echo "--- ref diff_plane s${seed} failed"
  fi
done

for seed in 0 1 2; do
  hold
  if [ ! -f results/r3/reference_baseline_shallow_water_s${seed}.json ]; then
    timeout 7200 python tools/run_reference_baseline.py shallow_water --seed ${seed} \
      || echo "--- ref shallow_water s${seed} failed"
  fi
done

hold
bash tools/interlude7_r3.sh >> outputs/interlude7.log 2>&1
echo INTERLUDE8_DONE $(date)
