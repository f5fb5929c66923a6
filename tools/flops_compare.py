"""Compare compiled train-step cost between this repo and the reference trainer.

Lowers both implementations' jitted nef/dual train steps at a production config
(default: the cahn_hilliard r3 budget) on the CPU backend and prints XLA's
``cost_analysis`` (flops, bytes accessed) plus program sizes. Gradient
equivalence is already test-enforced (tests/test_reference_training_parity.py);
this tool checks the *work* XLA actually schedules, to attribute any step-time
gap between the two trainers on identical budgets (see BASELINE.md measured rows).

CPU-only: no TPU claim, safe to run while experiments hold the chip.

    python tools/flops_compare.py cahn_hilliard
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("MPLBACKEND", "Agg")

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.dont_write_bytecode = True
if REF not in sys.path:
    sys.path.insert(0, REF)
if REPO not in sys.path:
    sys.path.append(REPO)

import numpy as np

from tools.run_reference_baseline import BUDGETS, ListLoader, _coords_for, _install_stubs, _ns


def _cost(lowered):
    c = lowered.compile()
    ca_list = c.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    return {
        "gflops": ca.get("flops", float("nan")) / 1e9,
        "mbytes": ca.get("bytes accessed", float("nan")) / 1e6,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", nargs="?", default="cahn_hilliard", choices=sorted(BUDGETS))
    args = ap.parse_args()

    _install_stubs()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map

    import yaml

    budget = BUDGETS[args.dataset]
    with open(os.path.join(REF, "experiments/fitting", f"config_{args.dataset}.yaml")) as f:
        raw = yaml.safe_load(f)
    raw.pop("hydra", None)
    cfg = _ns(raw)
    cfg.seed = 0
    cfg.dataset.num_signals_train = budget["batch_size"] * 2
    cfg.dataset.num_signals_test = budget["batch_size"]
    cfg.dataset.batch_size = budget["batch_size"]
    cfg.training.max_num_sampled_points = budget["max_num_sampled_points"]
    cfg.logging.checkpoint = False

    # Synthetic data at the real shapes (cost analysis only cares about shapes).
    shape_file = os.path.join("data", args.dataset, "train", "shape.json")
    import json

    t, h, w, c = json.load(open(shape_file))
    rng = np.random.RandomState(0)
    train = rng.randn(cfg.dataset.num_signals_train, t, h, w, c).astype(np.float32)
    image_shape = train.shape[1:]
    cfg.dataset.image_shape = image_shape
    cfg.dataset.traj_len_out_horizon = min(
        cfg.dataset.traj_len_out_horizon, t - cfg.dataset.traj_len_train
    )
    cfg.nef.num_in = 2
    cfg.nef.num_out = c

    coords = _coords_for(args.dataset, image_shape)
    loader = ListLoader(train, cfg.dataset.batch_size, shuffle=False, seed=0)

    from experiments.fitting import get_model_pde
    from experiments.fitting.trainers.pde_trainer import MetaSGDPDETrainer

    nef, ode_model = get_model_pde(cfg)
    ref = MetaSGDPDETrainer(
        config=cfg, nef=nef, ode_model=ode_model,
        train_loader=loader, val_loader=loader, coords=coords, seed=0,
    )
    ref.create_functions()
    ref_state = ref.init_train_state()
    batch = next(iter(loader))

    print(f"== {args.dataset} @ r3 budget: batch {cfg.dataset.batch_size}, "
          f"{cfg.training.max_num_sampled_points} pts ==")
    for name, fn in [("nef", ref.nef_train_step), ("dual", ref.dual_train_step)]:
        c = _cost(fn.lower(ref_state, batch))
        print(f"reference {name}_train_step: {c['gflops']:.2f} GFLOP  {c['mbytes']:.0f} MB accessed")

    # ---- ours at the identical budget ----------------------------------------
    from enf_pde_tpu.config import load_experiment_config
    from enf_pde_tpu.builders import build_models
    from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

    overrides = [
        f"dataset.batch_size={budget['batch_size']}",
        f"training.max_num_sampled_points={budget['max_num_sampled_points']}",
        "logging.checkpoint=false",
    ]
    ours_cfg = load_experiment_config(args.dataset, overrides)
    ours_cfg.dataset.image_shape = list(image_shape)
    ours_cfg.nef.num_in = int(np.asarray(coords).shape[-1])
    ours_cfg.nef.num_out = int(train.shape[-1])
    ours_cfg.dataset.traj_len_out_horizon = int(cfg.dataset.traj_len_out_horizon)
    decoder, ode = build_models(ours_cfg)
    trainer = MetaSGDTrainer(ours_cfg, decoder, ode, np.asarray(coords), seed=0)
    state = trainer.init_state()
    traj = train[: budget["batch_size"]]

    import jax as _jax

    for name, fn in [("nef", trainer.nef_train_step), ("dual", trainer.dual_train_step)]:
        jfn = fn if hasattr(fn, "lower") else _jax.jit(fn)
        c = _cost(jfn.lower(state, traj))
        print(f"ours      {name}_train_step: {c['gflops']:.2f} GFLOP  {c['mbytes']:.0f} MB accessed")


if __name__ == "__main__":
    main()
