#!/bin/bash
# Pre-generate the paper-scale Navier-Stokes cache toward the reference nonmaml
# config's own 8192-train / 512-test signal count
# (/root/reference/experiments/fitting/config/config_navier_stokes_nonmaml.yaml:27-28).
# Single host core => ~37 h total; the cache skips existing trajectories, so every
# finished 64-signal block is banked across rounds. Runs nice'd so the in-flight
# chip queue's host process keeps priority. Marker only written if every block
# succeeded (ADVICE r3 medium on pregen_sw.sh).
set -u
cd /root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=""
mkdir -p outputs
rm -f outputs/PREGEN_NS8192_DONE
fail=0

# test ids first (128-511: the smaller, higher-value block — unlocks eval scale)
for start in $(seq 128 64 448); do
  end=$((start + 63))
  ids=$(seq -s, $start $end)
  nice -n 19 python -m enf_pde_tpu.data.generate navier_stokes --group test --path data/ \
    --ids "$ids" || fail=1
  echo "NS8192 test block $start-$end done $(date +%H:%M:%S)"
done
for start in $(seq 1024 64 8128); do
  end=$((start + 63))
  ids=$(seq -s, $start $end)
  nice -n 19 python -m enf_pde_tpu.data.generate navier_stokes --group train --path data/ \
    --ids "$ids" || fail=1
  echo "NS8192 train block $start-$end done $(date +%H:%M:%S)"
done
if [ $fail -ne 0 ]; then
  echo "PREGEN_NS8192 FAILED: at least one block errored; marker NOT written" >&2
  exit 1
fi
touch outputs/PREGEN_NS8192_DONE
echo PREGEN_NS8192_DONE $(date)
