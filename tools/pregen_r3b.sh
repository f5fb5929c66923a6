#!/bin/bash
# Regenerate data caches after a container restart (only the git-committed IHC
# trajectories survive; everything else is generated on the host CPU).
# Order follows the TPU runner's schedule (tools/run_experiments_r3b.sh): NS first
# (needed by nonmaml s2 + navier_stokes_full), then shallow water, then the
# remaining ball-convection trajectories (64 train / 16 test for ihc64).
set -u
cd /root/repo
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=""
mkdir -p outputs

python -m enf_pde_tpu.data.generate navier_stokes --path data/ --group train --count 128
python -m enf_pde_tpu.data.generate navier_stokes --path data/ --group test  --count 32
touch outputs/PREGEN_NS_DONE
python -m enf_pde_tpu.data.generate shallow_water --path data/ --group train --count 32
python -m enf_pde_tpu.data.generate shallow_water --path data/ --group test  --count 8
touch outputs/PREGEN_SW_DONE
python -m enf_pde_tpu.data.generate ihc --path data/ --group train --count 64
python -m enf_pde_tpu.data.generate ihc --path data/ --group test  --count 16
touch outputs/PREGEN_IHC_DONE
echo PREGEN_ALL_DONE $(date)
