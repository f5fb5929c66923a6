#!/bin/bash
# One-shot recovery driver for the wedged TPU tunnel (2026-08-20 ~09:57 incident):
# probe the remote-compile path with a fresh-shape program every ~5 min; once a
# probe compiles, relaunch the reference ihc_full seed-0 baseline. Gives up after
# MAX_TRIES probes so the chip queue can be re-evaluated by hand.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
MAX_TRIES=${MAX_TRIES:-14}
for i in $(seq 1 $MAX_TRIES); do
  d=$((500 + i))
  if timeout 240 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones(($d, $((d+7)))); w = jnp.ones(($((d+7)), $((d+13))))
def f(a, b):
    for _ in range(4):
        a = a + 0.1 * (jnp.tanh(a @ b) @ b.T)
    return a
s = float(np.asarray(jnp.sum(jax.jit(f)(x, w))))
print(f'probe ok in {time.time()-t0:.1f}s sum={s:.3e}', flush=True)
" 2>&1 | grep "probe ok"; then
    echo "[retry] tunnel healthy on probe $i $(date +%H:%M:%S); launching ihc ref"
    timeout 21600 python tools/run_reference_baseline.py ihc --seed 0 \
      --out results/r3/reference_baseline_ihc_full_s0.json \
      --epochs 2000 --nef-until 500 --test-interval 250 --test-dp-interval 9999
    rc=$?
    echo "[retry] ihc ref exit=$rc $(date +%H:%M:%S)"
    if [ $rc -eq 0 ]; then
      git add -A results/r3 && git commit -q -m "chip queue: reference ihc_full seed 0 baseline (manual rerun after tunnel wedge)" || true
      rm -f /tmp/pause_r4   # let the paused queue resume with sw_full s1
    fi
    exit $rc
  fi
  echo "[retry] probe $i wedged $(date +%H:%M:%S); sleeping 300s"
  sleep 300
done
echo "[retry] giving up after $MAX_TRIES probes $(date +%H:%M:%S)"
exit 1
