#!/bin/bash
# Round-5 follow-up chip queue — opportunistic stages enabled by the device-cache
# speedup (~14x faster epochs). Started by tools/chain_r5b.sh when queue_r5.sh
# prints QUEUE_R5_DONE. Same DONE namespace conventions as queue_r5.sh.
#   (a) diff_sphere_full instrumented ours re-run (test_interval=150): records
#       ours' out-t trajectory over the ODE phase for the root-cause note
#       (results/r3/diff_sphere_out_t_note.md) — the reference's 5-point curve
#       exists, ours was measured only at the final epoch.
#   (b) ihc_full ours seed 1 (2nd seed for the flagship row).
#   (c) sw_full ours seed 2 (3rd ours seed at the full SW protocol).
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

run() {
  local tag=$1; shift
  for seed in $SEEDS; do
    local dir=outputs/r3/${tag}_s${seed}
    if [ -f ${dir}/DONE ] || [ -f results/r3/${tag}_s${seed}/DONE ]; then
      echo "skip ${tag}_s${seed}"; continue
    fi
    hold
    echo "=== ${tag} seed ${seed} $(date +%H:%M:%S) ==="
    for attempt in 1 2 3; do
      timeout ${TMO:-10800} python -m enf_pde_tpu.experiments.fit "$@" seed=${seed} \
        logging.log_dir=${dir} dataset.path=data/ \
        && touch ${dir}/DONE && break
      echo "--- ${tag}_s${seed} attempt ${attempt} did not finish"
      hold
    done
  done
  bash tools/snapshot_r3.sh || true
  gitc "chip queue r5b: snapshot ${tag} results"
}

# ---- (b) ihc_full ours seed 1 (2000-epoch de-facto reference protocol — see
#          queue_r5.sh stage 1: config_ihc.yaml's epochs 2001-2500 are unreachable
#          dead config in the reference trainer).
SEEDS="1" TMO=14400 \
run ihc_full ihc \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=2000 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=9999 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=0 logging.log_every_n_steps=1600 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=500 logging.resume=true

# ---- (a) instrumented diff_sphere_full ours: 5-point out-t trajectory.
SEEDS="2" TMO=7200 \
run diff_sphere_instr diff_sphere \
  logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=750 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=150 test.test_dp_interval=750 test.test_equiv_at_epoch=150 \
  logging.visualize_every_n_epochs=750 logging.log_every_n_steps=1600

# ---- (b2) diff_sphere out-t knob: ODE weight decay (the knob proposed by
#           results/r3/diff_sphere_out_t_note.md). Two cheap 150-epoch probes
#           pick the decay strength, then one full-protocol 750-epoch run tests
#           whether conservative dynamics close the out-t gap (ref 1.24e-5 vs
#           ours 6.97e-5 at the full budget) without giving up the in-t win.
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
echo "[r5b] wd probe winner: weight_decay_ode=${best_wd}"
SEEDS="0" TMO=7200 \
run diff_sphere_full_wd diff_sphere \
  logging.checkpoint=false dataset.num_signals_train=64 dataset.num_signals_test=16 \
  optimizer.weight_decay_ode=${best_wd} \
  training.num_epochs=750 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=150 test.test_dp_interval=9999 test.test_equiv_at_epoch=9999 \
  logging.visualize_every_n_epochs=0 logging.log_every_n_steps=1600

# ---- (c) sw_full ours seed 2.
SEEDS="2" TMO=10800 \
run sw_full shallow_water \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=1500 training.nef.train_until_epoch=500 training.ode.train_from_epoch=500 \
  test.test_interval=250 test.test_dp_interval=1500 test.test_equiv_at_epoch=500 \
  logging.visualize_every_n_epochs=1500 logging.log_every_n_steps=800 \
  logging.checkpoint=true logging.checkpoint_every_n_epochs=500 logging.resume=true

echo QUEUE_R5B_DONE $(date)
bash tools/snapshot_r3.sh || true
gitc "chip queue r5b: final snapshot"
