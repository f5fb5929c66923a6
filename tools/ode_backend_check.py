"""On-hardware loss-parity + timing for ``nef.ode_backend=pallas`` (meta-SGD).

VERDICT r3 next-round #5: before any production config opts its ode/dual-phase
rollout decode onto the fused kernel, show on the real chip that (a) the loss
trajectory matches the XLA path and (b) the step is faster. Runs the meta-SGD
``ode_train_step`` and ``dual_train_step`` K steps from the SAME initial state
on real NS data under both backends, reports per-step losses, relative drift,
and step times.

Run while no other process holds the TPU (the axon pool claim is exclusive):

    python tools/ode_backend_check.py navier_stokes dataset.num_signals_train=16 \
        dataset.num_signals_test=4

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
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer


def _run_steps(step, state, traj, k):
    losses = []
    for _ in range(k):
        loss, state = step(state, traj)
        losses.append(float(loss))  # scalar fetch = sync point
    return losses, state


def _time_step(step, state, traj, reps=10):
    # The step donates its input state: re-thread it every call, or the second
    # call reads deleted buffers (a hard TPU backend error; CPU tolerates it).
    loss, state = step(state, traj)
    float(loss)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        loss, state = step(state, traj)
        float(loss)
    return (time.perf_counter() - t0) / reps


def main(config_name, overrides, k=8):
    results = {"config": config_name, "k_steps": k}
    traj = None
    trainers = {}
    for backend in ("xla", "pallas"):
        cfg = load_experiment_config(
            config_name, overrides + [f"nef.ode_backend={backend}"]
        )
        train_loader, _, coords, decoder, ode_model = prepare(cfg)
        trainers[backend] = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=cfg.seed)
        if traj is None:
            batch = next(iter(train_loader))
            traj = jnp.asarray(np.asarray(batch[0]))
    assert trainers["pallas"].ode_decoder.backend == "pallas", "pallas opt-in inert?"

    for name in ("ode_train_step", "dual_train_step"):
        losses = {}
        for backend, tr in trainers.items():
            # Fresh identical state per backend (init is seed-deterministic; the
            # step donates its input state).
            losses[backend], _ = _run_steps(getattr(tr, name), tr.init_state(), traj, k)
        drift = max(
            abs(a - b) / max(abs(a), 1e-12)
            for a, b in zip(losses["xla"], losses["pallas"])
        )
        results[f"{name}_losses_xla"] = [round(v, 6) for v in losses["xla"]]
        results[f"{name}_losses_pallas"] = [round(v, 6) for v in losses["pallas"]]
        results[f"{name}_max_rel_drift"] = round(drift, 5)
        for backend, tr in trainers.items():
            results[f"{name}_s_{backend}"] = round(
                _time_step(getattr(tr, name), tr.init_state(), traj), 4
            )
        results[f"{name}_pallas_speedup"] = round(
            results[f"{name}_s_xla"] / results[f"{name}_s_pallas"], 3
        )
    print(json.dumps(results, indent=1))
    return results


if __name__ == "__main__":
    out = main(sys.argv[1], sys.argv[2:])
    os.makedirs("results/r4", exist_ok=True)
    with open("results/r4/ode_backend_check.json", "w") as f:
        json.dump(out, f, indent=1)
