"""Time a full validation epoch with the Pallas vs XLA decode backend (real TPU).

Closes VERDICT r2 #1's measurement sub-item: the fused Pallas kernel is the
production eval backend (`nef.eval_backend: pallas` in every config); this records
the resulting end-to-end validation-epoch delta on a trained checkpoint, holding
everything else (model state, data, inner-loop fitting, ODE rollout) identical.
The remaining non-decode validation cost (latent meta-fit + ODE integration, both
XLA in either mode) bounds the achievable end-to-end ratio below the kernel's
standalone 3.4x.

Run while no other process holds the TPU (the axon pool claim is exclusive):

    python tools/val_backend_timing.py outputs/r3/navier_stokes_full_s0 \
        navier_stokes dataset.num_signals_train=16 dataset.num_signals_test=16

Timing note: on the axon platform ``block_until_ready`` does not synchronize;
we fetch the scalar sums instead (same convention as ``bench.py``).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from enf_pde_tpu.config import load_experiment_config
from enf_pde_tpu.experiments.fit import prepare
from enf_pde_tpu.train.checkpoint import CheckpointManager
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer


def time_validate(trainer, state, batches, reps=3):
    def one_pass():
        tot = 0.0
        for n, traj in enumerate(batches):
            a, b = trainer.val_step(state, traj, n)
            tot += float(a) + float(b)  # scalar fetch = sync point
        return tot

    one_pass()  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(reps):
        one_pass()
    return (time.perf_counter() - t0) / reps


def main(ckpt_dir, config_name, overrides):
    cfg = load_experiment_config(config_name, overrides)
    cfg.logging.log_dir = ckpt_dir  # only used for checkpoint discovery
    train_loader, test_loader, coords, decoder, ode_model = prepare(cfg)
    batches = [np.asarray(b[0]) for b in test_loader]

    results = {}
    state = None
    for backend in ("pallas", "xla"):
        cfg.nef.eval_backend = backend
        trainer = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=cfg.seed)
        if state is None:
            mgr = CheckpointManager(ckpt_dir, every_n_epochs=1, keep_n=1)
            state = mgr.restore(trainer.init_state())
        results[f"val_epoch_s_{backend}"] = round(time_validate(trainer, state, batches), 3)

    results["val_epoch_pallas_speedup"] = round(
        results["val_epoch_s_xla"] / results["val_epoch_s_pallas"], 3
    )
    results["checkpoint"] = ckpt_dir
    results["n_batches"] = len(batches)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
