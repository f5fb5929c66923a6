#!/bin/bash
# Pre-generate the 1024-train / 128-test Navier-Stokes cache for the round-4
# signal-scale demonstration (VERDICT r3 next-round #4: prove the data pipeline,
# cache, and trainer at ~10x the current signal count; reference nonmaml intent is
# 8192/512, /root/reference/experiments/fitting/config/config_navier_stokes_nonmaml.yaml:27-28).
#
# Chunked blocks keep progress durable: the cache skips existing trajectories, so
# a restart resumes where it left off. Runs nice'd on the host CPU so the in-flight
# chip queue's host process keeps priority. Marker only written if every block
# succeeded (ADVICE r3 medium on pregen_sw.sh).
set -u
cd /root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=""
mkdir -p outputs
rm -f outputs/PREGEN_NS1024_DONE
fail=0

for start in $(seq 0 64 960); do
  end=$((start + 63))
  ids=$(seq -s, $start $end)
  nice -n 19 python -m enf_pde_tpu.data.generate navier_stokes --group train --path data/ \
    --ids "$ids" || fail=1
  echo "NS train block $start-$end done $(date +%H:%M:%S)"
done
for start in 0 64; do
  end=$((start + 63))
  ids=$(seq -s, $start $end)
  nice -n 19 python -m enf_pde_tpu.data.generate navier_stokes --group test --path data/ \
    --ids "$ids" || fail=1
  echo "NS test block $start-$end done $(date +%H:%M:%S)"
done
if [ $fail -ne 0 ]; then
  echo "PREGEN_NS1024 FAILED: at least one block errored; marker NOT written" >&2
  exit 1
fi
touch outputs/PREGEN_NS1024_DONE
echo PREGEN_NS1024_DONE $(date)
