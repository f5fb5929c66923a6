#!/bin/bash
# SUPERSEDED by tools/queue_r4.sh (round 4) — do not launch (ADVICE r3).
echo "superseded by tools/queue_r4.sh" >&2; exit 1
# Data-availability-aware reorder of interlude13 (same goal: restore raw evidence
# for the re-measured reference-exact-shape rows, then the full-budget flagships).
#
# Why the reorder: on the TPU platform, trajectory generation runs in a CPU
# subprocess by design (data/cache.py:52-60 — a failed in-process attempt can
# wedge the axon client), and this host has ONE CPU core, so shallow-water
# generation (3000-step lmax-64 spectral rollouts x 40 trajectories) takes hours.
# The ihc64 set is git-committed and diff_sphere data is closed-form (cheap), so
# the chip runs those families first while tools/pregen_sw.sh regenerates the SW
# cache in parallel; the SW runs gate on its marker.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }

run() {
  local tag=$1; shift
  for seed in $SEEDS; do
    local dir=outputs/r3/${tag}_s${seed}
    if [ -f ${dir}/DONE ] || [ -f results/r3/${tag}_s${seed}/DONE ]; then
      echo "skip ${tag}_s${seed}"; continue
    fi
    hold
    echo "=== ${tag} seed ${seed} $(date +%H:%M:%S) ==="
    for attempt in 1 2; do
      timeout 10800 python -m enf_pde_tpu.experiments.fit "$@" seed=${seed} \
        logging.log_dir=${dir} dataset.path=data/ \
        && touch ${dir}/DONE && break
      echo "--- ${tag}_s${seed} attempt ${attempt} did not finish"
    done
  done
  bash tools/snapshot_r3.sh || true
}

SPHERE_ARGS="logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90
  test.test_interval=150 test.test_dp_interval=150 logging.log_every_n_steps=400"

# Seed 0 of every data-ready family first (one committed raw run per row beats
# two raw seeds of one row if the session ends mid-queue), then seeds 1-2.
for SEEDS in 0 "1 2"; do
  run ihc64 ihc logging.checkpoint=false \
    dataset.num_signals_train=64 dataset.num_signals_test=16 \
    training.num_epochs=150 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
    test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
    test.test_equiv_at_epoch=100 logging.log_every_n_steps=400

  run diff_sphere diff_sphere $SPHERE_ARGS \
    logging.visualize_every_n_epochs=150 test.test_equiv_at_epoch=100

  run diff_sphere_abspos diff_sphere nef.invariant_type=abs_pos $SPHERE_ARGS
done

# Shallow water gates on the CPU pregen (tools/pregen_sw.sh).
while [ ! -f outputs/PREGEN_SW_DONE ]; do echo "waiting on SW pregen $(date +%H:%M:%S)"; sleep 120; done
export SEEDS="0 1 2"
run shallow_water shallow_water logging.checkpoint=false \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=250 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=250 test.test_dp_interval=250 logging.visualize_every_n_epochs=250 \
  test.test_equiv_at_epoch=200 logging.log_every_n_steps=400
echo RAW_EVIDENCE_DONE $(date)

# --- full-budget flagships (reference epoch protocol; signal counts documented
#     reductions: SW 32/8 and IHC 64/16 vs the reference's 512/128)
export SEEDS="0"
run sw_full shallow_water \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=1500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=1500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=1500 logging.log_every_n_steps=800 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

run ihc_full ihc \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=2500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=2500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=2500 logging.log_every_n_steps=1600 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

echo INTERLUDE14_DONE $(date)
bash tools/snapshot_r3.sh || true
