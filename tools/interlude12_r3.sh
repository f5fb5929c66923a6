#!/bin/bash
# Re-measure the three families whose configs had drifted from the reference's
# model-shape hyperparameters (round-3 audit; see tests/test_configs.py::
# test_config_values_match_reference): diff_sphere (embedding freqs 0.05/0.2 ->
# 0.01/0.01, basis_dim 64->32, node hid 16->32, fit_on 3->4), ihc (freqs ->
# 0.2/0.5, node hid 32->128), shallow_water (node hid 128->256, basis 64->128,
# fit_on 2->4). The reference head-to-head baselines already ran the reference
# at ITS OWN values, so these reruns make every head-to-head a same-model
# comparison. Then the two remaining full-budget flagships:
#   - sw_full_s0  (reference protocol: 1500 epochs, nef 0-500 / ode 500-1500)
#   - ihc_full_s0 (reference protocol: 2500 epochs, nef 0-500 / ode 500-2500;
#     its interlude11 launch was deferred behind these reruns via a DONE marker,
#     removed below)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }

run() {
  local tag=$1; shift
  for seed in $SEEDS; do
    local dir=outputs/r3/${tag}_s${seed}
    if [ -f ${dir}/DONE ]; then echo "skip ${tag}_s${seed}"; continue; fi
    hold
    echo "=== ${tag} seed ${seed} $(date +%H:%M:%S) ==="
    for attempt in 1 2; do
      timeout 10800 python -m enf_pde_tpu.experiments.fit "$@" seed=${seed} \
        logging.log_dir=${dir} dataset.path=data/ \
        && touch ${dir}/DONE && break
      echo "--- ${tag}_s${seed} attempt ${attempt} did not finish"
    done
  done
}

# Wait for interlude11 (diff_plane baselines + ref ihc s3) to release the chip.
while kill -0 "$(cat /tmp/interlude11.pid 2>/dev/null)" 2>/dev/null; do sleep 120; done
rm -f outputs/r3/ihc_full_s0/DONE   # deferred-launch marker, not a real run

export SEEDS="0 1 2"
run diff_sphere diff_sphere logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  test.test_equiv_at_epoch=100 logging.log_every_n_steps=400

run diff_sphere_abspos diff_sphere nef.invariant_type=abs_pos logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=90 training.ode.train_from_epoch=90 \
  test.test_interval=150 test.test_dp_interval=150 logging.log_every_n_steps=400

run ihc64 ihc logging.checkpoint=false \
  dataset.num_signals_train=64 dataset.num_signals_test=16 \
  training.num_epochs=150 training.nef.train_until_epoch=100 training.ode.train_from_epoch=100 \
  test.test_interval=150 test.test_dp_interval=150 logging.visualize_every_n_epochs=150 \
  test.test_equiv_at_epoch=100 logging.log_every_n_steps=400

run shallow_water shallow_water logging.checkpoint=false \
  dataset.num_signals_train=32 dataset.num_signals_test=8 \
  training.num_epochs=250 training.nef.train_until_epoch=150 training.ode.train_from_epoch=150 \
  test.test_interval=250 test.test_dp_interval=250 logging.visualize_every_n_epochs=250 \
  test.test_equiv_at_epoch=200 logging.log_every_n_steps=400

echo RERUNS_DONE $(date)
bash tools/snapshot_r3.sh || true

# --- full-budget flagships (reference epoch protocol, signal counts documented
#     as the reduction: SW 32/8 vs the reference's 512/128, IHC 64/16 vs 512/128)
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

echo INTERLUDE12_DONE $(date)
bash tools/snapshot_r3.sh || true
