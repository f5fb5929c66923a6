#!/bin/bash
# Round-4 chip queue, revision g — supersedes tools/queue_r4f.sh (same stages
# and DONE namespace, so it skips whatever already finished). Reordered for a
# short session after a VM restart wiped outputs/ and the compile cache:
#   (6)  diff_sphere_full head-to-head FIRST (750 epochs, nef 0-150 —
#        config_diff_sphere.yaml:69-78), interleaved ours/ref per seed so an
#        early cutoff still leaves complete 1- or 2-seed head-to-head rows.
#        ~148 s ours / ~200 s ref per 250 epochs -> ~8-12 min per run.
#   (2d) sw_full seed 1 both sides (2nd full-protocol SW seed, ~50 min + ~40).
#   (7)  diff_plane_full seed 0 both sides (1000 epochs, 128/32 signals).
#   (2b/2c) ihc_full tail (multi-hour): ours first with cross-session
#        checkpoint persistence into committed results/ckpt/, ref after.
# New vs r4f: persist()/restore_ckpt() copy <run>/checkpoints + metrics.jsonl
# into results/ckpt/<tag> after every attempt, and restore them before a run,
# so resume-capable runs survive an outputs/ wipe between sessions.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p outputs/r3 results/ckpt
echo $$ > /tmp/queue_r4.pid

hold() { while [ -f /tmp/pause_r3 ] || [ -f /tmp/pause_r4 ]; do sleep 60; done }

# Cross-session persistence for resume-capable runs (outputs/ is wiped on VM
# restart; results/ is committed). rsync --delete keeps only the latest orbax
# step dir. Small runs don't need this — persistence is opt-in via the
# PERSIST=1 env on run().
persist() {
  local dir=$1 tag=$2
  [ -d ${dir}/checkpoints ] || return 0
  mkdir -p results/ckpt/${tag}
  rsync -a --delete ${dir}/checkpoints results/ckpt/${tag}/ 2>/dev/null || \
    cp -r ${dir}/checkpoints results/ckpt/${tag}/
  [ -f ${dir}/metrics.jsonl ] && cp ${dir}/metrics.jsonl results/ckpt/${tag}/
}

restore_ckpt() {
  local dir=$1 tag=$2
  [ -d ${dir}/checkpoints ] && return 0          # live outputs win
  [ -d results/ckpt/${tag}/checkpoints ] || return 0
  mkdir -p ${dir}
  cp -r results/ckpt/${tag}/checkpoints ${dir}/
  [ -f results/ckpt/${tag}/metrics.jsonl ] && cp results/ckpt/${tag}/metrics.jsonl ${dir}/
  echo "restored checkpoint for ${tag} from results/ckpt"
}

run() {
  local tag=$1; shift
  for seed in $SEEDS; do
    local dir=outputs/r3/${tag}_s${seed}
    if [ -f ${dir}/DONE ] || [ -f results/r3/${tag}_s${seed}/DONE ]; then
      echo "skip ${tag}_s${seed}"; continue
    fi
    [ "${PERSIST:-0}" = 1 ] && restore_ckpt ${dir} ${tag}_s${seed}
    hold
    echo "=== ${tag} seed ${seed} $(date +%H:%M:%S) ==="
    for attempt in 1 2; do
      timeout ${TMO:-10800} python -m enf_pde_tpu.experiments.fit "$@" seed=${seed} \
        logging.log_dir=${dir} dataset.path=data/ \
        && touch ${dir}/DONE && break
      echo "--- ${tag}_s${seed} attempt ${attempt} did not finish"
      [ "${PERSIST:-0}" = 1 ] && persist ${dir} ${tag}_s${seed}
      hold
    done
    [ "${PERSIST:-0}" = 1 ] && persist ${dir} ${tag}_s${seed}
  done
  bash tools/snapshot_r3.sh || true
}

ref_run() {
  local tag=$1 dataset=$2 seed=$3 tmo=$4; shift 4
  local out=results/r3/reference_baseline_${tag}_s${seed}.json
  if [ -f "$out" ]; then echo "skip ref ${tag}_s${seed}"; return 0; fi
  hold
  echo "=== reference ${tag} seed ${seed} $(date +%H:%M:%S) ==="
  timeout ${tmo} python tools/run_reference_baseline.py ${dataset} --seed ${seed} \
    --out "$out" "$@" || echo "--- ref ${tag}_s${seed} failed"
}

# ---- 6. diff_sphere FULL reference protocol, interleaved ours/ref per seed.
for seed in 0 1 2; do
  SEEDS="$seed"
  run diff_sphere_full diff_sphere \
    logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16 \
    training.num_epochs=750 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
    test.test_interval=750 test.test_dp_interval=750 test.test_equiv_at_epoch=150 \
    logging.visualize_every_n_epochs=750 logging.log_every_n_steps=1600
  ref_run diff_sphere_full diff_sphere ${seed} 10800 --epochs 750 --nef-until 150
done

# ---- 2d. sw_full seed 1, both sides.
SEEDS="1" PERSIST=1
run sw_full shallow_water \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=1500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=1500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=1500 logging.log_every_n_steps=800 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true
ref_run sw_full shallow_water 1 10800 --epochs 1500 --nef-until 500

# ---- 7. diff_plane FULL reference protocol, seed 0 both sides.
SEEDS="0" PERSIST=1
run diff_plane_full diffusion_plane \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=1000 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
  test.test_interval=250 test.test_dp_interval=1000 test.test_equiv_at_epoch=100 \
  logging.visualize_every_n_epochs=1000 logging.log_every_n_steps=3200 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true
ref_run diff_plane_full diff_plane 0 10800 --epochs 1000 --nef-until 100 \
  --signals 128 --test-signals 32 \
  --test-interval 250 --test-dp-interval 1000

# ---- 2b. ihc_full flagship tail, ours (2500-epoch reference protocol at the
#          64/16 scaled ball set; multi-hour — checkpoints every 250 epochs
#          persisted to committed results/ckpt/ for cross-session resume).
SEEDS="0" PERSIST=1
run ihc_full ihc \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=2500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=2500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=2500 logging.log_every_n_steps=1600 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

# ---- 2c. ihc_full, reference side (no resume; contiguous 6 h window).
ref_run ihc_full ihc 0 21600 --epochs 2500 --nef-until 500 \
  --test-interval 250 --test-dp-interval 2500

echo QUEUE_R4_DONE $(date)
bash tools/snapshot_r3.sh || true
