#!/bin/bash
# Round-5c chip queue — merges the remaining queue_r5.sh + queue_r5b.sh stages
# (same DONE namespace: finished stages skip) and inserts the paper-scale
# NS-8192 run unlocked by the split-FFT TPU generator (commit e28e732).
# Order, by remaining-evidence value for the final round:
#   (1) ihc_full reference side (VERDICT r4 #1 — the flagship head-to-head's
#       missing half; .partial sidecar yields epoch-matched points even if the
#       session ends first).
#   (2) ns8192: the paper-scale 8192/512-signal NS regime (VERDICT r4 #4) at a
#       documented reduced epoch budget (50 = half of ns1024's 100; scale axis
#       is signals, not epochs), resume-capable, gated on the TPU-generated
#       cache being complete.
#   (3) sw_full seed 1 both sides (gated on the CPU SW pregen marker).
#   (4) diff_plane_full seed 0 both sides.
#   (5) r5b diagnostics: ihc_full ours seed 1, diff_sphere wd probes + full run,
#       instrumented diff_sphere trajectory, sw_full seed 2.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
mkdir -p outputs/r3 results/ckpt
echo $$ > /tmp/queue_r4.pid

hold() { while [ -f /tmp/pause_r3 ] || [ -f /tmp/pause_r4 ]; do sleep 60; done }

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

# ---- 1. ihc_full, reference side (2000-epoch de-facto protocol; see
#         queue_r5.sh stage 1 note on the unreachable epochs 2001-2500).
ref_run ihc_full ihc 0 28800 --epochs 2000 --nef-until 500 \
  --test-interval 250 --test-dp-interval 9999

# ---- 2. ns8192: paper-scale signal regime (config_navier_stokes_nonmaml.yaml:27-28
#         intent: 8192 train / 512 test signals). Epoch budget 30 (18 nef / 12 ode)
#         — documented as reduced vs ns1024's 100; at 256 steps/epoch this is
#         still 2.4x ns1024's total gradient steps. Val every 10 epochs so a
#         truncated run still yields epoch-matched metric points.
ntrain=$(ls data/navier_stokes/train/*.npz 2>/dev/null | wc -l)
ntest=$(ls data/navier_stokes/test/*.npz 2>/dev/null | wc -l)
if [ "$ntrain" -ge 8192 ] && [ "$ntest" -ge 512 ]; then
  SEEDS="0" PERSIST=1 TMO=14400 \
  run ns8192 navier_stokes \
    dataset.num_signals_train=8192 dataset.num_signals_test=512 \
    training.num_epochs=30 training.nef.train_until_epoch=18 training.ode.train_from_epoch=18 \
    test.test_interval=10 test.test_dp_interval=30 test.test_equiv_at_epoch=18 \
    logging.visualize_every_n_epochs=0 logging.log_every_n_steps=2560 \
    logging.checkpoint=true logging.checkpoint_every_n_epochs=5 logging.resume=true
else
  echo "ns8192 cache incomplete (train=$ntrain test=$ntest); skipping ns8192"
fi

# ---- 3. diff_plane FULL reference protocol, seed 0 both sides.
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

# ---- 4. sw_full seed 1, both sides — gated on the CPU SW pregen marker (the
#         cache did not survive the VM restart; pregen runs niced alongside).
#         Non-blocking: if the marker is absent the stage is skipped here and
#         retried once after the diagnostics below.
sw_full_s1() {
  [ -f outputs/PREGEN_SW_DONE ] || { echo "[queue] SW cache not ready; skip sw_full s1 for now"; return 0; }
  SEEDS="1" PERSIST=1 TMO=10800 \
  run sw_full shallow_water \
    dataset.num_signals_train=32 dataset.num_signals_test=8 \
    training.num_epochs=1500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
    test.test_interval=250 test.test_dp_interval=1500 test.test_equiv_at_epoch=500 \
    logging.visualize_every_n_epochs=1500 logging.log_every_n_steps=800 \
    logging.checkpoint=true logging.checkpoint_every_n_epochs=250 logging.resume=true
  ref_run sw_full shallow_water 1 10800 --epochs 1500 --nef-until 500 \
    --test-dp-interval 1500
}
sw_full_s1

# ---- 5. r5b diagnostics (see tools/queue_r5b.sh for stage rationale).
SEEDS="1" PERSIST=1 TMO=14400 \
run ihc_full ihc \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=2000 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=9999 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=0 logging.log_every_n_steps=1600 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=500 logging.resume=true

for wd in 0.1 1.0; do
  tagwd=diff_sphere_wd${wd/./} # wd01 / wd10
  SEEDS="0" TMO=3600 \
  run ${tagwd} diff_sphere \
    logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16 \
    optimizer.weight_decay_ode=${wd} \
    training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
    test.test_interval=150 test.test_dp_interval=9999 test.test_equiv_at_epoch=9999 \
    logging.visualize_every_n_epochs=0 logging.log_every_n_steps=1600
done
best_wd=$(python - <<'EOF'
import json
best, best_out = "0.1", float("inf")
for wd, tag in (("0.1", "diff_sphere_wd01_s0"), ("1.0", "diff_sphere_wd10_s0")):
    out = None
    for root in ("outputs/r3", "results/r3"):
        try:
            for line in open(f"{root}/{tag}/metrics.jsonl"):
                rec = json.loads(line)
                if "val_mse_out_t" in rec:
                    out = rec["val_mse_out_t"]
        except OSError:
            pass
    if out is not None and out < best_out:
        best, best_out = wd, out
print(best)
EOF
)
echo "[r5c] wd probe winner: weight_decay_ode=${best_wd}"
SEEDS="0" TMO=7200 \
run diff_sphere_full_wd diff_sphere \
  logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16 \
  optimizer.weight_decay_ode=${best_wd} \
  training.num_epochs=750 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=150 test.test_dp_interval=9999 test.test_equiv_at_epoch=9999 \
  logging.visualize_every_n_epochs=0 logging.log_every_n_steps=1600

SEEDS="2" TMO=7200 \
run diff_sphere_instr diff_sphere \
  logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=750 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=150 test.test_dp_interval=750 test.test_equiv_at_epoch=150 \
  logging.visualize_every_n_epochs=750 logging.log_every_n_steps=1600

# Retry sw_full s1 if the pregen finished during the diagnostics, then seed 2.
sw_full_s1
if [ -f outputs/PREGEN_SW_DONE ]; then
  SEEDS="2" PERSIST=1 TMO=10800 \
  run sw_full shallow_water \
    dataset.num_signals_train=32 dataset.num_signals_test=8 \
    training.num_epochs=1500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
    test.test_interval=250 test.test_dp_interval=1500 test.test_equiv_at_epoch=500 \
    logging.visualize_every_n_epochs=1500 logging.log_every_n_steps=800 \
    logging.checkpoint=true logging.checkpoint_every_n_epochs=500 logging.resume=true
fi

echo QUEUE_R5C_DONE $(date)
bash tools/snapshot_r3.sh || true
gitc "chip queue: final round-5c snapshot"
