"""Every shipped experiment config must load, build models, and build a trainer."""

import os

import numpy as np
import pytest

from enf_pde_tpu.builders import build_models, coordinate_system_for
from enf_pde_tpu.config import load_experiment_config
from enf_pde_tpu.data.registry import DATASET_NAMES, dataset_spec
from enf_pde_tpu.train.autodecode import AutodecodingTrainer
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

CONFIGS = [
    "navier_stokes",
    "navier_stokes_nonmaml",
    "diffusion_plane",
    "cahn_hilliard",
    "diff_sphere",
    "shallow_water",
    "ihc",
]


@pytest.mark.parametrize("name", CONFIGS)
def test_config_builds_models_and_trainer(name):
    cfg = load_experiment_config(name)
    spec = dataset_spec(cfg.dataset.name, cfg.dataset)
    coords = spec.coords
    cfg.nef.num_in = int(coords.shape[-1])
    cfg.nef.num_out = {"shallow_water_low_res": 3}.get(cfg.dataset.name, 1)
    # Shrink widths: this test checks schema/shape wiring, not numerics, and
    # param-init compiles at production widths dominated the fast suite's wall time.
    cfg.nef.num_hidden = min(cfg.nef.num_hidden, 32)
    cfg.node.num_hidden = min(cfg.node.num_hidden, 32)
    cfg.node.basis_dim = min(cfg.node.basis_dim, 16)
    cfg.training.max_num_sampled_points = min(cfg.training.max_num_sampled_points, 128)

    decoder, ode_model = build_models(cfg)
    assert decoder.num_hidden == cfg.nef.num_hidden

    # Trainer construction compiles nothing; catches schema/shape mistakes.
    if cfg.get_path("meta.meta_sgd", True):
        trainer = MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=0)
        state = trainer.init_state()
        assert "meta_sgd_lrs" in state.params
        # latent table is shared (one signal) for meta learning
        assert state.params["autodecoder"]["a"].shape[0] == 1
    else:
        cfg.dataset.num_signals_train = 4
        trainer = AutodecodingTrainer(cfg, decoder, ode_model, coords, seed=0)
        state = trainer.init_state()
        assert state.params["autodecoder"]["a"].shape[0] == 4


REFERENCE_CONFIG_DIR = "/root/reference/experiments/fitting"

# Our config name -> reference config file stem.
REF_CONFIG_NAME = {
    "navier_stokes": "navier_stokes",
    "navier_stokes_nonmaml": "navier_stokes_nonmaml",
    "diffusion_plane": "diff_plane",
    "cahn_hilliard": "cahn_hilliard",
    "diff_sphere": "diff_sphere",
    "shallow_water": "shallow_water",
    "ihc": "ihc",
}

# Dotted paths whose values must equal the reference's (the capability-surface
# contract, SURVEY.md section 2.3). Paths absent from a reference config are
# skipped (e.g. the non-MAML config has no meta-SGD inner-loop fields).
REF_PINNED_FIELDS = [
    "dataset.batch_size",
    "dataset.traj_len_train",
    "dataset.traj_len_out_horizon",
    "dataset.num_signals_train",
    "dataset.num_signals_test",
    "nef.num_layers",
    "nef.num_hidden",
    "nef.num_heads",
    "nef.latent_dim",
    "nef.num_latents",
    "nef.condition_value_transform",
    "nef.gaussian_window",
    "nef.optimize_gaussian_window",
    "nef.use_gaussian_window",
    "nef.embedding_type",
    "nef.embedding_freq_multiplier_invariant",
    "nef.embedding_freq_multiplier_value",
    "nef.invariant_type",
    "node.name",
    "node.num_layers",
    "node.num_hidden",
    "node.widening_factor",
    "node.kernel_size",
    "node.degree",
    "node.basis_dim",
    "node.dt",
    "node.method",
    "training.num_epochs",
    "training.ode.train_from_epoch",
    "training.ode.train_until_epoch",
    "training.nef.train_from_epoch",
    "training.nef.train_until_epoch",
    "training.nef.fit_on_num_steps",
    "meta.meta_sgd",
    "meta.num_inner_steps",
    "meta.inner_learning_rate_p",
    "meta.inner_learning_rate_a",
    "meta.inner_learning_rate_window",
    "meta.learning_rate_meta_sgd",
    "meta.noise_pos_inner_loop",
    "optimizer.name",
    "optimizer.learning_rate_enf",
    "optimizer.learning_rate_codes",
    "optimizer.learning_rate_ode",
]
# Documented deviations (README "Known deviations" / PARITY.md): the per-step
# coordinate-point budget is a TPU compute-budget choice, reduced identically on
# both sides of every measured head-to-head (tools/run_reference_baseline.py).
REF_UNPINNED = {"training.max_num_sampled_points"}


def _norm(v):
    """Normalize across YAML dialects: '1e-4'/'.2' strings -> float, bools kept."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return v.strip("'\"")
    return v


def _get_dotted(d, path):
    for part in path.split("."):
        if not isinstance(d, dict) or part not in d:
            return None
        d = d[part]
    return d


@pytest.mark.parametrize("name", CONFIGS)
def test_config_values_match_reference(name):
    """Guard against hyperparameter drift from the reference configs.

    Round-3 audit found three configs had drifted on model-shape fields
    (diff_sphere embedding freqs/basis_dim, ihc/shallow_water node widths),
    silently turning framework head-to-heads into tuning comparisons. Every
    meaningful field is now pinned to the reference's value; intentional
    deviations belong in REF_UNPINNED with documentation.
    """
    import yaml

    ref_path = f"{REFERENCE_CONFIG_DIR}/config_{REF_CONFIG_NAME[name]}.yaml"
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout not available")
    with open(ref_path) as f:
        ref = yaml.safe_load(f)
    cfg = load_experiment_config(name)

    mismatches = []
    for path in REF_PINNED_FIELDS:
        ref_v = _get_dotted(ref, path)
        if ref_v is None:
            continue  # field absent in this reference config
        ours_v = cfg.get_path(path, None)
        if _norm(ours_v) != _norm(ref_v):
            mismatches.append(f"{path}: ours={ours_v!r} ref={ref_v!r}")
    assert not mismatches, f"{name} drifted from reference values:\n" + "\n".join(mismatches)


def test_config_override_syntax():
    cfg = load_experiment_config("navier_stokes", ["nef.num_hidden=32", "seed=7"])
    assert cfg.nef.num_hidden == 32 and cfg.seed == 7


@pytest.mark.parametrize("name", DATASET_NAMES)
def test_dataset_spec_coords(name):
    class D(dict):
        __getattr__ = dict.__getitem__

        def to_json(self):
            return "{}"

    dcfg = D(name=name, path="/tmp/x", traj_len_train=10, traj_len_out_horizon=4)
    spec = dataset_spec(name, dcfg)
    assert spec.coords.ndim == 2
    expected_dim = 3 if name == "ihc" else 2
    assert spec.coords.shape[-1] == expected_dim
    assert np.isfinite(spec.coords).all()
    assert coordinate_system_for(name) in ("cartesian", "polar", "ball")
