"""Time the meta-SGD train steps (nef / ode / dual) for one experiment config.

Complements ``tools/train_backend_timing.py`` (which times the first-order
autodecoding trainer): this times the second-order meta-SGD steps that dominate
production training wall-clock, so per-step regressions/improvements (e.g. the
inner-loop ``unroll``, ``meta.inner_unroll``) are measured at the real shapes.

Run while no other process holds the TPU (the axon pool claim is exclusive):

    python tools/meta_step_timing.py shallow_water \
        dataset.num_signals_train=32 dataset.num_signals_test=8 \
        -- meta.inner_unroll=false

Overrides before ``--`` apply to every variant; each ``--``-separated group
afterwards adds one extra variant with those overrides on top (labelled by
them), so an A/B is a single invocation. Timing note: on the axon platform
``block_until_ready`` does not synchronize; we fetch the scalar loss instead
(same convention as ``bench.py``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from enf_pde_tpu.config import load_experiment_config
from enf_pde_tpu.experiments.fit import prepare
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer


def _time(step, state, traj, reps=10):
    # The steps donate their input state, so thread it through every call — a
    # donated buffer must never be fed twice. Chaining reps steps through the
    # state dependency and fetching only the LAST loss gives one tunnel
    # round-trip per measurement instead of one per rep.
    loss, state = step(state, traj)
    float(loss)  # compile + warmup; scalar fetch = sync point on axon
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, state = step(state, traj)
    float(loss)
    return (time.perf_counter() - t0) / reps


def measure(config_name, overrides):
    cfg = load_experiment_config(config_name, overrides)
    train_loader, _, coords, decoder, ode_model = prepare(cfg)
    trainer = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=cfg.seed)
    state = trainer.init_state()
    batch = next(iter(train_loader))
    traj = np.asarray(batch[0] if isinstance(batch, (tuple, list)) else batch)
    out = {}
    for name, step in (
        ("nef", trainer.nef_train_step),
        ("ode", trainer.ode_train_step),
        ("dual", trainer.dual_train_step),
    ):
        # jit(donate_argnums=(0,)) invalidates the donated state; re-init per step
        # kind so every measurement starts from an identical state.
        out[f"{name}_step_s"] = round(_time(step, trainer.init_state(), traj), 4)
    return out


def main(argv):
    groups = [[]]
    for a in argv:
        if a == "--":
            groups.append([])
        else:
            groups[-1].append(a)
    config_name, common = groups[0][0], groups[0][1:]
    results = {"config": config_name, "common_overrides": common}
    variants = [("base", [])] + [("+".join(g) or "base", g) for g in groups[1:]]
    for label, extra in variants:
        results[label] = measure(config_name, common + extra)
        print(f"[{label}] {results[label]}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:])
