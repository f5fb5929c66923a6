#!/bin/bash
# Round-4 chip queue, revision d — supersedes tools/queue_r4c.sh (same stages and
# DONE namespace, so it resumes wherever r4c stopped). Reorder: ns1024 moves
# ahead of the reference-nonmaml seeds. Rationale: ns1024 is ~25-40 min and
# completes VERDICT r3 #4 outright, while three reference-nonmaml seeds are
# ~30-60 min EACH and per-seed resumable (skip logic) — with ~3 h of round
# left, running ns1024 first guarantees both #4 and partial #3 instead of
# risking #4 entirely. Swap procedure: touch /tmp/pause_r4, wait for the
# in-flight job to finish and the old queue to hold, kill the old bash, rm the
# flag, launch this.
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

# ---- 2 (reference side). sw_full head-to-head (skipped if r4c finished it).
out=results/r3/reference_baseline_sw_full_s0.json
if [ ! -f "$out" ]; then
  hold
  echo "=== reference sw_full seed 0 $(date +%H:%M:%S) ==="
  timeout 10800 python tools/run_reference_baseline.py shallow_water --seed 0 \
    --epochs 1500 --nef-until 500 --out "$out" \
    || echo "--- ref sw_full s0 failed"
else
  echo "skip ref sw_full s0"
fi

# ---- 4. signal-scale demonstration: NS meta-SGD at 1024/128 signals (8x the
#         round-2 row, 1/8 the reference nonmaml intent). Checkpoint+resume so a
#         round boundary never loses progress. Gated on the CPU pregen marker.
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

# ---- 2b. ihc_full flagship, ours (reference 2500-epoch protocol; resume-capable
#          — any chip time it gets this round is kept for round 5)
SEEDS="0"
run ihc_full ihc \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=2500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=2500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=2500 logging.log_every_n_steps=1600 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true

echo QUEUE_R4_DONE $(date)
bash tools/snapshot_r3.sh || true
