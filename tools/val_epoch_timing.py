"""Time one full validation pass (val split, in-t + out-t rollout decode) with the
fused Pallas eval backend vs the XLA chunked path, on the real chip.

Completes the VERDICT r2 #1 evidence: the kernel is the production eval backend of
every experiment config (``nef.eval_backend: pallas``); this records what that buys
per validation epoch at a real experiment's shapes (full-field decode is the
dominant eval cost — reference ``pde_trainer.py:393-402``).

Run on the TPU:  python tools/val_epoch_timing.py [dataset] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from enf_pde_tpu.config import load_experiment_config
from enf_pde_tpu.experiments.fit import prepare
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer


def time_val_pass(trainer, loader, iters=3):
    def one_pass():
        tot = None
        for i, batch in enumerate(loader):
            traj = jax.numpy.asarray(batch[0])
            a, b = trainer.val_step(trainer._timing_state, traj, i)
            tot = (a + b) if tot is None else tot + a + b
        return float(tot)  # blocking fetch — the only sync point per pass

    one_pass()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_pass()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", nargs="?", default="navier_stokes")
    ap.add_argument("--signals", type=int, default=128, help="train-signal budget (match the cache)")
    ap.add_argument("--test-signals", type=int, default=32)
    ap.add_argument("--out", default="results/r3/val_epoch_timing.json")
    args = ap.parse_args()

    res = {"dataset": args.dataset, "backend": jax.default_backend(),
           "signals": [args.signals, args.test_signals]}
    for backend in ("xla", "pallas"):
        cfg = load_experiment_config(
            args.dataset,
            [
                f"nef.eval_backend={backend}",
                f"dataset.num_signals_train={args.signals}",
                f"dataset.num_signals_test={args.test_signals}",
                "logging.checkpoint=false",
                "dataset.path=data/",
            ],
        )
        train_loader, test_loader, coords, decoder, ode_model = prepare(cfg)
        trainer = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=0)
        trainer._timing_state = trainer.init_state()
        dt = time_val_pass(trainer, test_loader)
        res[f"val_epoch_s_{backend}"] = round(dt, 4)
        print(f"{args.dataset} val epoch [{backend}]: {dt:.3f} s", flush=True)
    res["val_epoch_pallas_speedup"] = round(
        res["val_epoch_s_xla"] / res["val_epoch_s_pallas"], 3
    )
    print(json.dumps(res))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
