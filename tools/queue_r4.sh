#!/bin/bash
# SUPERSEDED by tools/queue_r4b.sh -> tools/queue_r4c.sh — do not launch.
echo "superseded by tools/queue_r4c.sh" >&2; exit 1
# Round-4 chip queue (single v5e; jobs strictly sequential).
#
# Ordered by VERDICT r3 "Next round":
#   1. finish the raw-evidence restoration (ihc64 s1-2, diff_sphere s0-2,
#      diff_sphere_abspos s0-2, shallow_water s0-2) at the exact round-3 budgets
#      so the re-measured EXPERIMENTS.md aggregates get committed raw logs;
#   6. two extra diff_sphere seeds (s3, s4) to settle the noise-dominated in-t row;
#   2. sw_full flagship at the reference's 1500-epoch protocol
#      (/root/reference/experiments/fitting/config/config_shallow_water.yaml:69),
#      checkpoint+resume so preemption never loses progress;
#   3. non-MAML reference head-to-head (gated on tools/run_reference_baseline.py
#      having nonmaml support — see NONMAML_READY marker);
#   2b. ihc_full flagship at the reference's 2500-epoch protocol
#      (config_ihc.yaml:70), resume-capable: any chip time it gets is kept.
#
# Supersedes interlude13/14 (round 3). Writes /tmp/queue_r4.pid; holds whenever
# /tmp/pause_r3 (driver bench) or /tmp/pause_r4 (manual interleave) exists.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
echo $$ > /tmp/queue_r4.pid

hold() { while [ -f /tmp/pause_r3 ] || [ -f /tmp/pause_r4 ]; do sleep 60; done }

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
      hold
    done
  done
  bash tools/snapshot_r3.sh || true
}

SPHERE_ARGS="logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90
  test.test_interval=150 test.test_dp_interval=150 logging.log_every_n_steps=400"

# ---- 1. raw-evidence restoration (round-3 budgets, exact args of interlude13/14)
SEEDS="1 2"
run ihc64 ihc logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  test.test_equiv_at_epoch=100 logging.log_every_n_steps=400

SEEDS="0 1 2"
run diff_sphere diff_sphere $SPHERE_ARGS \
  logging.visualize_every_n_epochs=150 test.test_equiv_at_epoch=100

run diff_sphere_abspos diff_sphere nef.invariant_type=abs_pos $SPHERE_ARGS

run shallow_water shallow_water logging.checkpoint=false \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=250 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=250 test.test_dp_interval=250 logging.visualize_every_n_epochs=250 \
  test.test_equiv_at_epoch=200 logging.log_every_n_steps=400
echo RAW_EVIDENCE_DONE $(date)
touch outputs/RAW_EVIDENCE_DONE

# ---- 6. diff_sphere seed tightening: 5-seed row at the same budget
SEEDS="3 4"
run diff_sphere diff_sphere $SPHERE_ARGS

# ---- 2. sw_full flagship (reference 1500-epoch protocol; signals documented
#         reduction 32/8 vs the reference's 512/128)
SEEDS="0"
run sw_full shallow_water \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=1500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=1500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=1500 logging.log_every_n_steps=800 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

# ---- 3. non-MAML reference head-to-head (ours already has the 3-seed row).
#         Gated: only runs once the harness extension landed (marker written by
#         the builder after a CPU smoke test).
if [ -f outputs/NONMAML_REF_READY ]; then
  for seed in 0 1 2; do
    out=results/r3/reference_baseline_navier_stokes_nonmaml_s${seed}.json
    if [ -f "$out" ]; then echo "skip ref nonmaml s${seed}"; continue; fi
    hold
    echo "=== reference nonmaml seed ${seed} $(date +%H:%M:%S) ==="
    timeout 10800 python tools/run_reference_baseline.py navier_stokes_nonmaml \
      --seed ${seed} --out "$out" || echo "--- ref nonmaml s${seed} failed"
  done
else
  echo "NONMAML_REF_READY absent; skipping reference nonmaml head-to-head"
fi

# ---- 2b. ihc_full flagship (reference 2500-epoch protocol; resume-capable)
SEEDS="0"
run ihc_full ihc \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=2500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=2500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=2500 logging.log_every_n_steps=1600 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

echo QUEUE_R4_DONE $(date)
bash tools/snapshot_r3.sh || true
