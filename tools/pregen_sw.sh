#!/bin/bash
# Regenerate the shallow-water trajectory cache on the host CPU (the TPU platform
# forces subprocess generation — data/cache.py:52-60 — and the live cache did not
# survive the VM restart). Block-sized id chunks keep progress durable: each
# finished chunk writes its npz files, so a restart resumes where it left off
# (existing trajectories are skipped by the cache).
set -u
cd /root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=""
mkdir -p outputs
# A stale marker must not pre-open interlude/queue gates before this run finishes
# (ADVICE r3 medium: an incomplete cache pushes hours of subprocess generation
# into the gated 3h-timeout TPU training attempts).
rm -f outputs/PREGEN_SW_DONE
fail=0

CFG='{"name": "shallow_water_low_res", "batch_size": 1, "traj_len_train": 10, "traj_len_out_horizon": 4, "path": "data/", "num_signals_train": 32, "num_signals_test": 8}'
for ids in 0,1,2,3 4,5,6,7 8,9,10,11 12,13,14,15 16,17,18,19 20,21,22,23 24,25,26,27 28,29,30,31; do
  python -m enf_pde_tpu.data.generate shallow_water_low_res --group train --path data/ \
    --ids $ids --dataset-cfg "$CFG" || fail=1
  echo "SW train block $ids done $(date +%H:%M:%S)"
done
for ids in 0,1,2,3 4,5,6,7; do
  python -m enf_pde_tpu.data.generate shallow_water_low_res --group test --path data/ \
    --ids $ids --dataset-cfg "$CFG" || fail=1
  echo "SW test block $ids done $(date +%H:%M:%S)"
done
if [ $fail -ne 0 ]; then
  echo "PREGEN_SW FAILED: at least one block errored; marker NOT written" >&2
  exit 1
fi
touch outputs/PREGEN_SW_DONE
echo PREGEN_SW_DONE $(date)
