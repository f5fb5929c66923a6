"""Run the REFERENCE trainer on this repo's cached data at this repo's budgets.

Executes BASELINE.md's "run the reference configs and record" procedure (VERDICT r2
weak #3: "nothing establishes what the reference would score at the same budget").
The reference's own ``MetaSGDPDETrainer`` (``/root/reference/experiments/fitting/
trainers/pde_trainer.py:14-553``) is imported unmodified and driven through its own
``train_model`` lifecycle (``_base_pde_trainer.py:239-271``) on

  * the SAME cached npz trajectories this repo's round-2/3 runs trained on,
  * the SAME budget overrides as ``tools/run_experiments_r3.sh``,
  * the SAME chip (whatever backend JAX selects — the axon TPU under the driver).

Its wandb metric stream is captured through a stub and the final metrics dict is
written to ``results/r3/reference_baseline_<dataset>_s<seed>.json`` so BASELINE.md
and EXPERIMENTS.md can quote measured reference numbers instead of "unexecuted".

The reference ships ``val_step`` unjitted with its ``jax.jit`` wrapping commented
out (``pde_trainer.py:544-553``); eager per-op dispatch over the remote TPU tunnel
is pathologically slow, so ``--jit-val`` (default on) re-enables exactly those
commented-out jit lines — numerics are unchanged.

Usage (needs the TPU to itself — the axon platform serializes processes):

    python tools/run_reference_baseline.py cahn_hilliard --seed 0
    python tools/run_reference_baseline.py cahn_hilliard --seed 0 --no-jit-val
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
import types

os.environ.setdefault("MPLBACKEND", "Agg")

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.dont_write_bytecode = True
if REF not in sys.path:
    sys.path.insert(0, REF)
if REPO not in sys.path:
    sys.path.append(REPO)  # for enf_pde_tpu (diff_sphere coord grid reuse)

import numpy as np
import yaml

# ----------------------------------------------------------------- wandb capture
WANDB_LOG: list[dict] = []
_TRAINER = [None]  # set after construction so log records carry the epoch


def _wandb_log(d, commit=True):
    rec = {str(k): v for k, v in d.items() if not type(v).__name__ == "Image"}
    if not rec:
        return
    if _TRAINER[0] is not None:
        rec["_epoch"] = int(getattr(_TRAINER[0], "epoch", 0))
        rec["_global_step"] = int(getattr(_TRAINER[0], "global_step", 0))
    rec["_t"] = round(time.time(), 3)  # per-record wall clock -> per-epoch step timing
    rec = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in rec.items()}
    # Keep only JSON-encodable scalars: the Image stub returns SimpleNamespace, whose
    # type name is NOT "Image", so the filter above misses it (crashed the CH s0
    # JSONL dump after an otherwise-complete run — the metrics json was written).
    rec = {k: v for k, v in rec.items() if isinstance(v, (int, float, str, bool)) or v is None}
    WANDB_LOG.append(rec)
    # Stream every record to a .partial sidecar as it happens: a run killed by
    # timeout/watchdog/VM-restart keeps its epoch-matched val points (the final
    # _log.jsonl below is only written if training completes).
    if _STREAM_PATH[0]:
        try:
            with open(_STREAM_PATH[0], "a") as f:
                f.write(json.dumps(rec, default=str) + "\n")
        except OSError:
            pass


_STREAM_PATH = [None]


def _install_stubs():
    # The reference imports wandb/omegaconf at module scope; neither is installed.
    # Same approach as tests/test_reference_training_parity.py:30-55, except the
    # wandb.log stub here RECORDS the metric stream instead of discarding it.
    if "wandb" not in sys.modules:
        stub = types.ModuleType("wandb")
        stub.log = _wandb_log
        stub.init = lambda *a, **k: None
        stub.Image = lambda *a, **k: types.SimpleNamespace()
        sys.modules["wandb"] = stub
    if "omegaconf" not in sys.modules:
        try:
            import omegaconf  # noqa: F401
        except ModuleNotFoundError:
            stub = types.ModuleType("omegaconf")

            class _OmegaConf:
                @staticmethod
                def to_container(cfg):
                    return {}

            stub.OmegaConf = _OmegaConf
            sys.modules["omegaconf"] = stub


# ------------------------------------------------------------------ config glue
class _NS(dict):
    """Attribute-access namespace standing in for OmegaConf (test-proven)."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__


def _coerce(v):
    # yaml.safe_load leaves dot-less scientific notation ("1e-4") as str; hydra
    # would coerce it. Mirror that so optax gets floats.
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return v
    return v


def _ns(d):
    return _NS({k: _ns(v) if isinstance(v, dict) else _coerce(v) for k, v in d.items()})


# Budgets: keep in lockstep with tools/run_experiments_r3.sh so the reference
# rows aggregate 1:1 with this repo's result rows.
BUDGETS = {
    "cahn_hilliard": dict(
        num_signals_train=64, num_signals_test=16, batch_size=4,
        max_num_sampled_points=1024,
        num_epochs=150, nef_until=90, ode_from=90,
        test_interval=150, test_dp_interval=150, log_every_n_steps=400,
    ),
    "navier_stokes": dict(
        num_signals_train=128, num_signals_test=32, batch_size=8,
        max_num_sampled_points=512,  # this repo's NS config default (r2 row budget)
        num_epochs=400, nef_until=240, ode_from=240,
        test_interval=400, test_dp_interval=400, log_every_n_steps=800,
    ),
    "diff_sphere": dict(
        # This repo's r3 diff_sphere runs use the config defaults for batch size and
        # point budget (experiments/configs/diff_sphere.yaml:14,50) — mirror them.
        num_signals_train=64, num_signals_test=16, batch_size=2,
        max_num_sampled_points=2048,
        num_epochs=150, nef_until=90, ode_from=90,
        test_interval=150, test_dp_interval=150, log_every_n_steps=400,
    ),
    "ihc": dict(
        # Mirror of the ihc64 runs in tools/run_experiments_r3b.sh (this repo's
        # config batch_size=1, 2048-point budget; 64/16 scaled ball-convection set).
        num_signals_train=64, num_signals_test=16, batch_size=1,
        max_num_sampled_points=2048,
        num_epochs=150, nef_until=100, ode_from=100,
        test_interval=150, test_dp_interval=150, log_every_n_steps=400,
    ),
    "shallow_water": dict(
        # Mirror of this repo's shallow_water rows (tools/run_experiments_r2.sh:52
        # + configs/shallow_water.yaml: batch 1, 2048-point budget). Trains on the
        # 96x48 low-res set; the reference protocol then zero-shot-validates the
        # trained state on the full 192x96 grid (fit_shallow_water.py:65-91).
        num_signals_train=32, num_signals_test=8, batch_size=1,
        max_num_sampled_points=2048,
        num_epochs=250, nef_until=150, ode_from=150,
        test_interval=250, test_dp_interval=250, log_every_n_steps=400,
    ),
    "navier_stokes_nonmaml": dict(
        # Mirror of this repo's autodecoding-baseline rows
        # (run_experiments_r2.sh:75-78 / r3.sh:64-67): 128/32 signals, 300 epochs
        # (nef 0-200 / ode 200-300), config-default 2048-point budget. The val
        # re-fit budget is matched separately via --refit-epochs (our rows used
        # test.refit_epochs=50; the reference's validate_epoch would otherwise
        # re-fit for its full nef budget, nonmaml_pde_trainer.py:446-447).
        num_signals_train=128, num_signals_test=32, batch_size=8,
        max_num_sampled_points=2048,
        num_epochs=300, nef_until=200, ode_from=200,
        # test_dp_interval must never fire for nonmaml (the reference ships 9999):
        # the BASE trainer's validate_epoch_dp expects meta-style val_step_dp5
        # attrs (_base_pde_trainer.py:383) the nonmaml trainer never defines —
        # its dp suite lives inside its own validate_epoch instead.
        test_interval=300, test_dp_interval=999_999_999, log_every_n_steps=800,
    ),
    "diff_plane": dict(
        # Mirror of this repo's diffusion_plane rows (run_experiments_r2.sh:44).
        num_signals_train=64, num_signals_test=16, batch_size=8,
        max_num_sampled_points=1024,
        num_epochs=100, nef_until=60, ode_from=60,
        test_interval=100, test_dp_interval=100, log_every_n_steps=200,
    ),
}

# This repo's cache dir per reference dataset name (data/registry.py keys).
CACHE_DIR = {
    "cahn_hilliard": "cahn_hilliard",
    "navier_stokes": "navier_stokes",
    "navier_stokes_nonmaml": "navier_stokes",
    "diff_sphere": "diff_sphere",
    "ihc": "ihc_convection",
    "shallow_water": "shallow_water",  # cache stores 192x96; low-res pooled at load
    "diff_plane": "diffusion_plane",
}

# Per-trajectory frame skip applied by this repo's loader at load time
# (data/registry.py postprocess: ihc and shallow_water drop the first 6
# spin-up frames). The reference run must see the identical frames.
FRAME_SKIP = {"ihc": 6, "shallow_water": 6}


def _pool_2x2(trajs: np.ndarray) -> np.ndarray:
    """[N, T, H, W, C] -> 2x2 mean-pooled, the registry's low-res postprocess
    (data/shallow_water.py::_avg_pool_2x2) applied batch-wise."""
    n, t, h, w, c = trajs.shape
    return trajs.reshape(n, t, h // 2, 2, w // 2, 2, c).mean(axis=(3, 5))


class ListLoader:
    """Batched loader over cached trajectories, with per-epoch seeded shuffling.

    Mimics the torch DataLoader surface the reference trainer uses: ``len()`` is
    the number of batches, iteration yields ``(trajectory, coords, index)``
    (``pde_trainer.py:248`` unpacks exactly that triple).
    """

    def __init__(self, trajs: np.ndarray, batch_size: int, shuffle: bool, seed: int):
        self.trajs = trajs
        self.bs = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.n_batches = len(trajs) // batch_size

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        order = (
            self.rng.permutation(len(self.trajs))
            if self.shuffle
            else np.arange(len(self.trajs))
        )
        for b in range(self.n_batches):
            idx = order[b * self.bs : (b + 1) * self.bs]
            yield self.trajs[idx], None, idx


def _load_cached(dataset: str, group: str, count: int) -> np.ndarray:
    d = os.path.join("data", CACHE_DIR[dataset], group)
    files = sorted(glob.glob(os.path.join(d, "traj_*.npz")))
    if len(files) < count:
        raise SystemExit(
            f"need {count} cached {dataset}/{group} trajectories in {d}, found "
            f"{len(files)} — run the repo experiment first (its loader fills the cache)"
        )
    out = np.stack([np.load(f)["data"] for f in files[:count]])
    return out.astype(np.float32)


def _coords_for(dataset: str, image_shape) -> "jnp.ndarray":
    import jax.numpy as jnp

    if dataset in ("cahn_hilliard", "navier_stokes", "navier_stokes_nonmaml", "diff_plane"):
        # Verbatim grid construction from the reference entry points
        # (fit_cahn_hilliard.py:31-33, fit_navier_stokes.py:32-34,
        # fit_diff_plane.py:32-33).
        return jnp.stack(
            jnp.meshgrid(
                jnp.linspace(-1, 1, image_shape[1]),
                jnp.linspace(-1, 1, image_shape[2]),
            ),
            axis=-1,
        ).reshape(-1, 2)
    if dataset == "diff_sphere":
        # The reference takes coords from its dataset object (fit_diff_sphere.py:32),
        # and its polar_periodic invariant expects (phi, theta[colatitude]) pairs
        # (polar_periodic.py:52-60). Use the SAME grid this repo's loader attaches to
        # the cached trajectories (data/registry.py: angular_coords over
        # sphere_diffusion_grid) so data layout and coords agree exactly.
        from enf_pde_tpu.data import angular_coords
        from enf_pde_tpu.data.diffusion_sphere import sphere_diffusion_grid

        g = sphere_diffusion_grid(image_shape[1], image_shape[2])
        return jnp.asarray(angular_coords(np.asarray(g.phi), np.asarray(g.theta)))
    if dataset == "ihc":
        # (phi, theta, r) triples over the 48x24x24 ball grid — this repo's
        # ball_coords is grid-for-grid identical to the reference's own
        # construction in fit_ihc.py:33-37 (ij meshgrid, theta offset 1e-3).
        from enf_pde_tpu.data import ball_coords

        return jnp.asarray(ball_coords(image_shape[1], image_shape[2], image_shape[3]))
    if dataset == "shallow_water":
        # (phi, theta) pairs over the Gauss-Legendre sphere grid at whatever
        # resolution image_shape carries (96x48 low-res train / 192x96 super-res)
        # — the identical grid this repo's loader attaches (data/registry.py).
        from enf_pde_tpu.data import angular_coords
        from enf_pde_tpu.data.sphere_harmonics import SphereGrid

        g = SphereGrid(image_shape[1], image_shape[2])
        return jnp.asarray(angular_coords(np.asarray(g.phi), np.asarray(g.theta)))
    raise SystemExit(f"no coords builder for {dataset}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=sorted(BUDGETS))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=None, help="override budget epochs")
    ap.add_argument("--signals", type=int, default=None, help="override train signals")
    ap.add_argument("--nef-until", type=int, default=None,
                    help="explicit nef->ode phase switch epoch (default: scale proportionally)")
    ap.add_argument("--test-signals", type=int, default=None, help="override test signals")
    ap.add_argument(
        "--test-interval", type=int, default=None,
        help="override val interval. The reference only validates when "
        "`epoch %% test_interval == 0` (_base_pde_trainer.py:265), so for an "
        "--epochs override that the family's default interval does not divide "
        "(e.g. ihc 2500 %% 150), pass a divisor or the final-epoch val never fires.",
    )
    ap.add_argument(
        "--test-dp-interval", type=int, default=None,
        help="override dropout-val interval (same %% caveat; ignored for nonmaml, "
        "whose dp interval must stay un-fireable — see its BUDGETS note)",
    )
    ap.add_argument(
        "--no-jit-val",
        action="store_true",
        help="leave val_step eager, exactly as the reference ships it",
    )
    ap.add_argument(
        "--refit-epochs", type=int, default=50,
        help="nonmaml only: val-autodecoder re-fit epochs per dropout rate. The "
        "reference re-fits for its nef budget (nonmaml_pde_trainer.py:446-447), "
        "which at this repo's reduced budget would be 200; this repo's rows used "
        "test.refit_epochs=50 — default matches them 1:1. Pass -1 for the "
        "reference's unmodified proportional behavior.",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    _out_path = args.out or f"results/r3/reference_baseline_{args.dataset}_s{args.seed}.json"
    os.makedirs(os.path.dirname(_out_path) or ".", exist_ok=True)
    _STREAM_PATH[0] = _out_path.replace(".json", "_log.jsonl.partial")
    # fresh attempt, fresh stream (appends within one process lifetime only)
    try:
        os.unlink(_STREAM_PATH[0])
    except OSError:
        pass

    _install_stubs()

    import jax

    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map  # the reference targets an older JAX

    if os.environ.get("REF_BASELINE_CPU"):
        # sitecustomize pre-registers the TPU platform and ignores JAX_PLATFORMS;
        # the config knob still works (same trick as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")

    budget = dict(BUDGETS[args.dataset])
    if args.epochs is not None:
        budget["nef_until"] = max(1, int(budget["nef_until"] * args.epochs / budget["num_epochs"]))
        budget["ode_from"] = budget["nef_until"]
        budget["num_epochs"] = args.epochs
        budget["test_interval"] = min(budget["test_interval"], args.epochs)
        if not args.dataset.endswith("nonmaml"):
            # nonmaml's dp interval must stay un-fireable (see its BUDGETS note).
            budget["test_dp_interval"] = min(budget["test_dp_interval"], args.epochs)
    if args.signals is not None:
        budget["num_signals_train"] = args.signals
        # At least one full val batch: the reference's validate_epoch crashes on an
        # empty val loader (its `batch` loop variable is read after the loop,
        # _base_pde_trainer.py:338) — that sank the NS smoke at 4 signals / batch 8.
        budget["num_signals_test"] = max(budget["batch_size"], args.signals // 4)
    if args.nef_until is not None:
        budget["nef_until"] = args.nef_until
        budget["ode_from"] = args.nef_until
    if args.test_signals is not None:
        budget["num_signals_test"] = args.test_signals
    if args.test_interval is not None:
        budget["test_interval"] = args.test_interval
    if args.test_dp_interval is not None and not args.dataset.endswith("nonmaml"):
        budget["test_dp_interval"] = args.test_dp_interval

    with open(os.path.join(REF, "experiments/fitting", f"config_{args.dataset}.yaml")) as f:
        raw = yaml.safe_load(f)
    raw.pop("hydra", None)
    cfg = _ns(raw)

    cfg.seed = args.seed
    cfg.dataset.num_signals_train = budget["num_signals_train"]
    cfg.dataset.num_signals_test = budget["num_signals_test"]
    cfg.dataset.batch_size = budget["batch_size"]
    cfg.training.max_num_sampled_points = budget["max_num_sampled_points"]
    cfg.training.num_epochs = budget["num_epochs"]
    cfg.training.nef.train_until_epoch = budget["nef_until"]
    cfg.training.ode.train_from_epoch = budget["ode_from"]
    cfg.test.test_interval = budget["test_interval"]
    cfg.test.test_dp_interval = budget["test_dp_interval"]
    cfg.logging.log_every_n_steps = budget["log_every_n_steps"]
    cfg.logging.checkpoint = False

    train = _load_cached(args.dataset, "train", cfg.dataset.num_signals_train)
    test = _load_cached(args.dataset, "test", cfg.dataset.num_signals_test)
    skip = FRAME_SKIP.get(args.dataset, 0)
    if skip:
        train, test = train[:, skip:], test[:, skip:]
    if args.dataset == "shallow_water":
        # The cache stores the 192x96 solver output; training runs on the 2x2
        # mean-pooled 96x48 grid (registry's shallow_water_low_res postprocess /
        # reference dataset.name=shallow_water_low_res). Keep the hi-res test
        # split for the zero-shot super-resolution validation afterwards.
        test_hi = test
        train, test = _pool_2x2(train), _pool_2x2(test)
    image_shape = train.shape[1:]
    cfg.dataset.image_shape = image_shape
    # The reference NS config requests 50 out-horizon frames from 20-frame data;
    # its _val_step would crash reshaping a 60-frame rollout onto a 20-frame
    # trajectory (pde_trainer.py:365,405). This repo's trainer clamps the horizon
    # to the data (train/meta_sgd.py), evaluating 10 out-frames — clamp the
    # reference identically so both report the same protocol.
    t_data = image_shape[0]
    cfg.dataset.traj_len_out_horizon = min(
        cfg.dataset.traj_len_out_horizon, t_data - cfg.dataset.traj_len_train
    )
    cfg.nef.num_in = 3 if args.dataset == "ihc" else 2
    cfg.nef.num_out = image_shape[-1]

    coords = _coords_for(args.dataset, image_shape)

    train_loader = ListLoader(train, cfg.dataset.batch_size, shuffle=True, seed=args.seed)
    val_loader = ListLoader(test, cfg.dataset.batch_size, shuffle=False, seed=args.seed)

    from experiments.fitting import get_model_pde

    nonmaml = args.dataset.endswith("nonmaml")
    if nonmaml:
        from experiments.fitting.trainers.nonmaml_pde_trainer import (
            NonMetaPDETrainer as MetaSGDPDETrainer,
        )

        # The nonmaml config leaves the ode phase open to its full 2000-epoch
        # protocol; close both phase windows at the budget (train_epoch checks
        # from/until on each, nonmaml_pde_trainer.py:367-375).
        cfg.training.nef.train_from_epoch = 0
        cfg.training.ode.train_until_epoch = budget["num_epochs"]
    else:
        from experiments.fitting.trainers.pde_trainer import MetaSGDPDETrainer

    nef, ode_model = get_model_pde(cfg)
    trainer = MetaSGDPDETrainer(
        config=cfg,
        nef=nef,
        ode_model=ode_model,
        train_loader=train_loader,
        val_loader=val_loader,
        coords=coords,
        seed=args.seed,
    )
    _TRAINER[0] = trainer
    trainer.create_functions()

    if args.dataset == "shallow_water":
        # The reference's image viz drops the first channel when C>1
        # (_base_pde_trainer.py:604-606) and then imshows the remaining TWO
        # channels (:619) — a TypeError for its own 3-channel shallow-water data
        # (h + 2 velocity components, pdes.py:679). Metrics never touch this
        # path; disable it rather than patch reference behavior.
        trainer.visualize_batch = lambda *a, **k: None

    if nonmaml:
        # Metrics never touch the viz path; skip its eager full-batch decodes
        # (8 calls per validate_epoch — pure chip time).
        trainer.visualize_batch = lambda *a, **k: None
        if args.refit_epochs >= 0:
            # Match this repo's val re-fit budget 1:1: the reference re-fits the
            # val autodecoder for `nef.train_until_epoch` epochs per dropout rate
            # (total_val_epochs, nonmaml_pde_trainer.py:446-447; the loop is
            # range(1, n), hence +1). Pinned only for the duration of
            # validate_epoch so the training phase switch is untouched.
            _orig_validate = trainer.validate_epoch

            def _validate(state):
                tve = cfg.training.nef.train_until_epoch
                cfg.training.nef.train_until_epoch = args.refit_epochs + 1
                try:
                    return _orig_validate(state)
                finally:
                    cfg.training.nef.train_until_epoch = tve

            trainer.validate_epoch = _validate

    if not args.no_jit_val and not nonmaml:
        # Re-enable the reference's own commented-out jit lines
        # (pde_trainer.py:544-548) — eager val over the TPU tunnel is unusable.
        # (The nonmaml trainer's _val_step ships with its jit decorator intact,
        # nonmaml_pde_trainer.py:201; nothing to re-enable there.)
        trainer.val_step = jax.jit(trainer._val_step)
        trainer.val_step_dp5 = jax.jit(lambda s, b: trainer._val_step(s, b, initial_state_dp=0.05))
        trainer.val_step_dp10 = jax.jit(lambda s, b: trainer._val_step(s, b, initial_state_dp=0.1))
        trainer.val_step_dp50 = jax.jit(lambda s, b: trainer._val_step(s, b, initial_state_dp=0.5))

    print(
        f"[reference-baseline] {args.dataset} seed={args.seed} "
        f"signals={cfg.dataset.num_signals_train}/{cfg.dataset.num_signals_test} "
        f"epochs={cfg.training.num_epochs} backend={jax.default_backend()}",
        flush=True,
    )
    t0 = time.time()
    final_state = trainer.train_model(cfg.training.num_epochs)
    wall = time.time() - t0

    final = {k: float(v) for k, v in trainer.metrics.items()}
    if nonmaml:
        # The nonmaml validate_epoch reports its val metrics through wandb.log
        # only (nonmaml_pde_trainer.py:538-541) — merge every val record so the
        # final dict carries the last-logged value per key (dp suite included).
        for rec in WANDB_LOG:
            if any(k.startswith(("val_mse", "train_mse_in", "train_mse_out")) for k in rec):
                final.update(
                    {
                        k: float(v)
                        for k, v in rec.items()
                        if isinstance(v, (int, float)) and not k.startswith("_")
                    }
                )

    if args.dataset == "shallow_water":
        # Zero-shot super-resolution: validate the trained low-res state on the
        # full 192x96 grid, exactly the reference protocol
        # (fit_shallow_water.py:65-91 — second trainer over the hi-res dataset,
        # one validate_epoch on the final state; no retraining).
        train_hi = _load_cached(args.dataset, "train", cfg.dataset.num_signals_train)[:, skip:]
        hi_shape = train_hi.shape[1:]
        cfg.dataset.image_shape = hi_shape
        coords_hi = _coords_for(args.dataset, hi_shape)
        hi_trainer = MetaSGDPDETrainer(
            config=cfg,
            nef=nef,
            ode_model=ode_model,
            train_loader=ListLoader(train_hi, cfg.dataset.batch_size, shuffle=False, seed=args.seed),
            val_loader=ListLoader(test_hi, cfg.dataset.batch_size, shuffle=False, seed=args.seed),
            coords=coords_hi,
            seed=args.seed,
        )
        hi_trainer.create_functions()
        hi_trainer.visualize_batch = lambda *a, **k: None  # same 3-channel viz bug
        if not args.no_jit_val:
            hi_trainer.val_step = jax.jit(hi_trainer._val_step)
        t1 = time.time()
        hi_trainer.validate_epoch(final_state)
        final["superres_mse_in_t"] = float(hi_trainer.metrics["val_mse_in_t"])
        final["superres_mse_out_t"] = float(hi_trainer.metrics["val_mse_out_t"])
        final["superres_train_mse_in_t"] = float(hi_trainer.metrics["train_mse_in_t"])
        final["superres_train_mse_out_t"] = float(hi_trainer.metrics["train_mse_out_t"])
        final["superres_wall_s"] = round(time.time() - t1, 1)
    out = {
        "dataset": args.dataset,
        "seed": args.seed,
        "budget": budget,
        "backend": jax.default_backend(),
        "jit_val": not args.no_jit_val,
        "refit_epochs": (args.refit_epochs if nonmaml else None),
        "wall_s": round(wall, 1),
        "final_metrics": final,
    }
    path = args.out or f"results/r3/reference_baseline_{args.dataset}_s{args.seed}.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    with open(path.replace(".json", "_log.jsonl"), "w") as f:
        for rec in WANDB_LOG:
            f.write(json.dumps(rec, default=str) + "\n")
    if _STREAM_PATH[0]:
        try:
            os.unlink(_STREAM_PATH[0])  # complete log written; drop the sidecar
        except OSError:
            pass
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
