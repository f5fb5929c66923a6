#!/bin/bash
# Round-4 chip queue, revision f — supersedes tools/queue_r4e.sh (same stages and
# DONE namespace, so it resumes wherever r4e stopped). Adds one opportunistic
# tail stage: diff_plane at the full reference protocol (1000 epochs, nef 0-100 —
# config_diff_plane.yaml:72-81) head-to-head, 1 seed both sides, at the scaled
# 128/32 signal set (precedent: ihc_full's 64/16 vs the reference's config
# count). Earlier r4e comments follow; priority order after the r4d stages:
#   (2b) ihc_full OURS first (resume-capable: any interruption is kept), then
#   (2c) the reference-side ihc_full seed 0 in one contiguous block (the
#        reference trainer has no resume, so it gets an uninterrupted ~4.5-6 h
#        window; if the round ends mid-run, only this stage is lost),
#   (6)  diff_sphere at the FULL reference protocol (750 epochs, nef 0-150 —
#        config_diff_sphere.yaml:69-78) head-to-head, 3 seeds both sides: the
#        definitive answer to VERDICT r3 weak #4's noise-dominated row,
#   (2d) sw_full seed 1 both sides (opportunistic: 3-seed full-protocol SW).
# Swap procedure: touch /tmp/pause_r4, wait for the in-flight job to finish and
# the old queue to hold, kill the old bash, rm the flag, launch this.
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

# ref_run <tag> <dataset> [extra args...] — one reference-baseline seed with
# skip logic keyed on the output json (the reference trainer has no resume).
ref_run() {
  local tag=$1 dataset=$2 seed=$3 tmo=$4; shift 4
  local out=results/r3/reference_baseline_${tag}_s${seed}.json
  if [ -f "$out" ]; then echo "skip ref ${tag}_s${seed}"; return 0; fi
  hold
  echo "=== reference ${tag} seed ${seed} $(date +%H:%M:%S) ==="
  timeout ${tmo} python tools/run_reference_baseline.py ${dataset} --seed ${seed} \
    --out "$out" "$@" || echo "--- ref ${tag}_s${seed} failed"
}

# ---- 2 (reference side). sw_full head-to-head (done in r4c/d; skip logic).
ref_run sw_full shallow_water 0 10800 --epochs 1500 --nef-until 500

# ---- 4. signal-scale demonstration: NS meta-SGD at 1024/128 signals.
if [ -f outputs/PREGEN_NS1024_DONE ]; then
  SEEDS="0"
  run ns1024 navier_stokes \
    dataset.num_signals_train=1024 dataset.num_signals_test=128 \
    training.num_epochs=100 training.nef.train_until_epoch=60 training.ode.train_from_epoch=60 \
    test.test_interval=100 test.test_dp_interval=100 test.test_equiv_at_epoch=60 \
    logging.visualize_every_n_epochs=100 logging.log_every_n_steps=1280 \
    logging.checkpoint=true logging.checkpoint_every_n_epochs=20 logging.resume=true
else
  echo "PREGEN_NS1024_DONE absent; skipping ns1024"
fi

# ---- 3. non-MAML reference head-to-head (ours already has the 3-seed row).
if [ -f outputs/NONMAML_REF_READY ]; then
  for seed in 0 1 2; do
    ref_run navier_stokes_nonmaml navier_stokes_nonmaml ${seed} 10800
  done
else
  echo "NONMAML_REF_READY absent; skipping reference nonmaml head-to-head"
fi

# ---- 2b. ihc_full flagship, ours (reference 2500-epoch protocol at the 64/16
#          scaled ball set; resume-capable, so it goes before the reference side
#          — an interruption here is kept, an interruption there is lost).
SEEDS="0"
run ihc_full ihc \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=2500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=2500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=2500 logging.log_every_n_steps=1600 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

# ---- 2c. ihc_full, reference side (config_ihc.yaml:70-79 epochs/phases at the
#          same 64/16 set; ~4.5-6 h contiguous, no resume — 6 h timeout).
#          --test-interval 250: the family default 150 does not divide 2500, so
#          the reference's `epoch % interval == 0` final val would never fire;
#          dp suite end-only, matching our ihc_full's test_dp_interval=2500.
ref_run ihc_full ihc 0 21600 --epochs 2500 --nef-until 500 \
  --test-interval 250 --test-dp-interval 2500

# ---- 6. diff_sphere at the FULL reference protocol (750 epochs, nef 0-150,
#         config_diff_sphere.yaml:69-78), 3 seeds BOTH sides, same 64/16 set.
SEEDS="0 1 2"
run diff_sphere_full diff_sphere \
  logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=750 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=750 test.test_dp_interval=750 test.test_equiv_at_epoch=150 \
  logging.visualize_every_n_epochs=750 logging.log_every_n_steps=1600
for seed in 0 1 2; do
  ref_run diff_sphere_full diff_sphere ${seed} 10800 --epochs 750 --nef-until 150
done

# ---- 2d. sw_full seed 1, both sides (opportunistic 2nd full-protocol SW seed).
SEEDS="1"
run sw_full shallow_water \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=1500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=1500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=1500 logging.log_every_n_steps=800 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true
ref_run sw_full shallow_water 1 10800 --epochs 1500 --nef-until 500

# ---- 7 (tail, opportunistic). diff_plane at the FULL reference protocol
#      (1000 epochs, nef 0-100, config_diff_plane.yaml:72-81), 1 seed both
#      sides, scaled 128/32 signals (heat-kernel cache generates in seconds).
SEEDS="0"
run diff_plane_full diffusion_plane \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=1000 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
  test.test_interval=250 test.test_dp_interval=1000 test.test_equiv_at_epoch=100 \
  logging.visualize_every_n_epochs=1000 logging.log_every_n_steps=3200 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true
ref_run diff_plane_full diff_plane 0 10800 --epochs 1000 --nef-until 100 \
  --signals 128 --test-signals 32 \
  --test-interval 250 --test-dp-interval 1000

echo QUEUE_R4_DONE $(date)
bash tools/snapshot_r3.sh || true
