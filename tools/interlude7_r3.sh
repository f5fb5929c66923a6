#!/bin/bash
# Full-epoch-budget IHC flagship (the 3D ball geometry analogue of the
# navier_stokes_full runs): the reference config_ihc.yaml protocol is 2500
# epochs with the nef->ode switch at 500 (its dataset is 512/128 signals; this
# run keeps the generated 64/16 set — signal count documented as the reduction).
# Checkpointed + resumable so a round boundary doesn't lose the run.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

hold() { while [ -f /tmp/pause_r3 ]; do sleep 60; done }

dir=outputs/r3/ihc_full_s0
if [ ! -f ${dir}/DONE ]; then
  hold
  for attempt in 1 2; do
    timeout 10800 python -m enf_pde_tpu.experiments.fit ihc seed=0 \
      dataset.path=data/ dataset.num_signals_train=64 dataset.num_signals_test=16 \
      training.num_epochs=2500 training.nef.train_until_epoch=500 \
      training.ode.train_from_epoch=500 \
      test.test_interval=250 test.test_dp_interval=2500 test.test_equiv_at_epoch=500 \
      logging.visualize_every_n_epochs=2500 logging.log_every_n_steps=1600 \
      logging.checkpoint=true logging.checkpoint_every_n_epochs=500 logging.resume=true \
      logging.log_dir=${dir} \
      && touch ${dir}/DONE && break
    echo "--- ihc_full_s0 attempt ${attempt} did not finish"
  done
fi
echo INTERLUDE7_DONE $(date)
