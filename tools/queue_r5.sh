#!/bin/bash
# Round-5 chip queue — supersedes tools/queue_r4g.sh (same DONE namespace, so
# finished stages skip). Priorities per VERDICT r4 "Next round":
#   (1) ihc_full ours FIRST (2500-epoch reference protocol — slipped 3 rounds;
#       resume-capable, checkpoints persisted AND committed every attempt).
#   (2) ihc_full reference side (contiguous; intermediate val metrics land in
#       its _log.jsonl every 250 epochs, so even a truncated run yields
#       epoch-matched head-to-head points).
#   (3) diff_sphere_full seed 2 both sides (completes the 3x3 matrix behind the
#       out-t gap diagnosis; ref side at explicit 750/750 intervals per ADVICE
#       r4 medium — seeds 0-1 inherited 150/150, so ref wall_s is comparable
#       within {s0,s1} but not vs s2; final metrics unaffected).
#   (4) sw_full seed 1 both sides (ref side --test-dp-interval 1500 per ADVICE
#       r4 low; seed-0 ref ran the dp suite at 250 — wall-clock not comparable
#       across ref seeds, metrics are).
#   (5) diff_plane_full seed 0 both sides.
# VERDICT r4 #3: every stage commits its results (snapshot + baseline JSONs +
# persisted checkpoints) so a VM wipe at any moment loses nothing recorded.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p outputs/r3 results/ckpt
echo $$ > /tmp/queue_r4.pid

hold() { while [ -f /tmp/pause_r3 ] || [ -f /tmp/pause_r4 ]; do sleep 60; done }

# Commit recorded evidence; retries around the builder's own commits.
gitc() {
  local msg=$1
  for i in 1 2 3 4 5; do
    git add -A results/r3 results/r4 results/ckpt 2>/dev/null
    if git diff --cached --quiet; then return 0; fi
    git commit -q -m "$msg" && return 0
    sleep 10
  done
  echo "[queue] git commit failed after retries: $msg" >&2
}

# Cross-session persistence for resume-capable runs (outputs/ is wiped on VM
# restart; results/ is committed). The rsync --delete keeps only the latest
# orbax step dir. Persistence is opt-in via the PERSIST=1 env on run().
persist() {
  local dir=$1 tag=$2
  [ -d ${dir}/checkpoints ] || return 0
  mkdir -p results/ckpt/${tag}
  rsync -a --delete ${dir}/checkpoints results/ckpt/${tag}/ 2>/dev/null || \
    cp -r ${dir}/checkpoints results/ckpt/${tag}/
  [ -f ${dir}/metrics.jsonl ] && cp ${dir}/metrics.jsonl results/ckpt/${tag}/
  gitc "chip queue: persist ${tag} checkpoint"
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
    for attempt in 1 2 3; do
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
  gitc "chip queue: snapshot ${tag} results"
}

ref_run() {
  local tag=$1 dataset=$2 seed=$3 tmo=$4; shift 4
  local out=results/r3/reference_baseline_${tag}_s${seed}.json
  if [ -f "$out" ]; then echo "skip ref ${tag}_s${seed}"; return 0; fi
  hold
  echo "=== reference ${tag} seed ${seed} $(date +%H:%M:%S) ==="
  timeout ${tmo} python tools/run_reference_baseline.py ${dataset} --seed ${seed} \
    --out "$out" "$@" || echo "--- ref ${tag}_s${seed} failed"
  gitc "chip queue: reference ${tag} seed ${seed} baseline"
}

# ---- 1. ihc_full flagship, ours (2000-epoch de-facto reference protocol:
#         config_ihc.yaml asks for 2500 epochs but its ode phase ends at 2000 and
#         the reference trainer raises on any uncovered epoch
#         (_base_pde_trainer.py:290-298), so epochs 2001-2500 are unreachable dead
#         config — the runnable protocol is nef 0-500 / ode 500-2000. dp interval
#         mirrors the reference's un-fireable test_dp_interval: 9999.
#         Checkpoints every 250 epochs persisted + committed for resume.)
SEEDS="0" PERSIST=1 TMO=28800 \
run ihc_full ihc \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=2000 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=9999 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=0 logging.log_every_n_steps=1600 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

# ---- 2. ihc_full, reference side (no resume; intermediate metrics every 250
#         epochs land in the _log.jsonl even if the session ends first).
#         --epochs 2000, NOT 2500: with 2500 the reference itself dies at epoch
#         2001 ("No training step set") after ~3.5 h and writes no output JSON.
ref_run ihc_full ihc 0 28800 --epochs 2000 --nef-until 500 \
  --test-interval 250 --test-dp-interval 9999

# ---- 3. diff_sphere FULL protocol seed 2, both sides (completes 3x3 matrix).
SEEDS="2" PERSIST=0 TMO=10800 \
run diff_sphere_full diff_sphere \
  logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=750 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=750 test.test_dp_interval=750 test.test_equiv_at_epoch=150 \
  logging.visualize_every_n_epochs=750 logging.log_every_n_steps=1600
ref_run diff_sphere_full diff_sphere 2 10800 --epochs 750 --nef-until 150 \
  --test-interval 750 --test-dp-interval 750

# ---- 4. sw_full seed 1, both sides.
SEEDS="1" PERSIST=1 TMO=10800 \
run sw_full shallow_water \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=1500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=1500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=1500 logging.log_every_n_steps=800 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true
ref_run sw_full shallow_water 1 10800 --epochs 1500 --nef-until 500 \
  --test-dp-interval 1500

# ---- 5. diff_plane FULL reference protocol, seed 0 both sides.
SEEDS="0" PERSIST=1 TMO=10800 \
run diff_plane_full diffusion_plane \
  dataset.num_signals_train=128 dataset.num_signals_test=32 \
  training.num_epochs=1000 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
  test.test_interval=250 test.test_dp_interval=1000 test.test_equiv_at_epoch=100 \
  logging.visualize_every_n_epochs=1000 logging.log_every_n_steps=3200 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true
ref_run diff_plane_full diff_plane 0 10800 --epochs 1000 --nef-until 100 \
  --signals 128 --test-signals 32 \
  --test-interval 250 --test-dp-interval 1000

echo QUEUE_R5_DONE $(date)
bash tools/snapshot_r3.sh || true
gitc "chip queue: final round-5 snapshot"
