#!/bin/bash
# After interlude9 (diff_plane baselines + flagship retry): run reference IHC
# seed 3 as the replacement for seed 2, which diverged to NaN at epoch 115
# (documented in EXPERIMENTS.md) — gives three *finishing* reference seeds for
# the B^3 head-to-head alongside the divergence report.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }
while kill -0 "$(cat /tmp/interlude9.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done

hold
if [ ! -f results/r3/reference_baseline_ihc_s3.json ]; then
  timeout 7200 python tools/run_reference_baseline.py ihc --seed 3 \
    || echo "--- ref ihc s3 failed"
fi
echo INTERLUDE10_DONE $(date)
