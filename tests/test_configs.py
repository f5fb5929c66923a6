"""Every shipped experiment config must load, build models, and build a trainer."""

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
