"""Time first-order training steps with the Pallas vs XLA decode backend (real TPU).

VERDICT r2 #1's second half: beyond forward-only eval (measured by
``val_backend_timing.py``), the fused kernel's custom VJP makes it usable for the
*first-order* training phases — the non-MAML autodecoding trainer
(``train/autodecode.py``) and inference-time latent fitting are plain
``value_and_grad`` through the decode, so ``nef.backend: pallas`` runs the Pallas
forward AND backward kernels end to end (no second-order XLA fallback on this path,
unlike meta-SGD's outer gradient).

This times the autodecode ``nef_train_step`` (decode fwd+bwd dominated) and
``ode_train_step`` (decodes b*T rollout frames) under both backends on the same
real data batch, holding everything else fixed.

Run while no other process holds the TPU (the axon pool claim is exclusive):

    python tools/train_backend_timing.py navier_stokes_nonmaml \
        dataset.num_signals_train=16 dataset.num_signals_test=4

Timing note: on the axon platform ``block_until_ready`` does not synchronize;
we fetch the scalar loss instead (same convention as ``bench.py``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.config import load_experiment_config
from enf_pde_tpu.experiments.fit import prepare
from enf_pde_tpu.train.autodecode import AutodecodingTrainer


def _time(step, state, traj, idx, reps=10):
    loss, _ = step(state, traj, idx)
    float(loss)  # compile + warmup; scalar fetch = sync point
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, _ = step(state, traj, idx)
        float(loss)
    return (time.perf_counter() - t0) / reps


def main(config_name, overrides, backends=("xla", "pallas")):
    results = {"config": config_name}
    state0 = traj = idx = None
    for backend in backends:
        cfg = load_experiment_config(config_name, overrides + [f"nef.backend={backend}"])
        train_loader, _, coords, decoder, ode_model = prepare(cfg)
        trainer = AutodecodingTrainer(cfg, decoder, ode_model, coords, seed=cfg.seed)
        if state0 is None:
            state0 = trainer.init_state()
            traj, _, idx = next(iter(train_loader))
            traj = jnp.asarray(np.asarray(traj))
            idx = jnp.asarray(np.asarray(idx))
        results[f"nef_step_s_{backend}"] = round(
            _time(trainer.nef_train_step, state0, traj, idx), 4
        )
        results[f"ode_step_s_{backend}"] = round(
            _time(trainer.ode_train_step, state0, traj, idx), 4
        )

    ref, new = backends
    for k in ("nef", "ode"):
        results[f"{k}_step_{new}_speedup"] = round(
            results[f"{k}_step_s_{ref}"] / results[f"{k}_step_s_{new}"], 3
        )
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    bk = tuple(os.environ.get("BACKENDS", "xla,pallas").split(","))
    main(sys.argv[1], sys.argv[2:], backends=bk)
