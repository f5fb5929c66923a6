"""Autodecoding (non-MAML) trainer tests on a tiny problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.data.loader import TrajectoryLoader
from enf_pde_tpu.train.autodecode import AutodecodingTrainer

from tests.test_train_e2e import tiny_cfg, SIZE

N_SIGNALS = 4


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    cfg.meta.meta_sgd = False
    cfg.dataset.num_signals_train = N_SIGNALS
    cfg.dataset.num_signals_test = N_SIGNALS
    cfg.optimizer.learning_rate_codes = 1e-2
    decoder, ode_model = build_models(cfg)
    coords = planar_coords(SIZE, SIZE)
    trainer = AutodecodingTrainer(cfg, decoder, ode_model, coords, seed=0)
    state = trainer.init_state()
    traj = generate_diffusion_trajectories(np.arange(N_SIGNALS), size=SIZE)[:, :8]
    traj = traj / (np.abs(traj).max() + 1e-8)
    return cfg, trainer, state, jnp.asarray(traj)


def test_autodecode_state(setup):
    _, trainer, state, _ = setup
    assert state.params["autodecoder"]["a"].shape[0] == N_SIGNALS
    assert "meta_sgd_lrs" not in state.params


def test_nef_step_fits_codes_and_decoder(setup):
    _, trainer, state, traj = setup
    idx = jnp.arange(N_SIGNALS)
    losses = []
    s = state
    for _ in range(10):
        loss, s = trainer.nef_train_step(s, traj, idx)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"autodecoding did not fit: {losses}"
    moved = jnp.abs(s.params["autodecoder"]["a"] - state.params["autodecoder"]["a"]).max()
    assert float(moved) > 0  # per-signal codes updated


def test_codes_only_step_freezes_decoder(setup):
    _, trainer, state, traj = setup
    idx = jnp.arange(N_SIGNALS)
    loss, s = trainer.codes_only_step(state, traj, idx, update_nef=False)
    leaf0 = jax.tree_util.tree_leaves(state.params["nef"])[0]
    leaf1 = jax.tree_util.tree_leaves(s.params["nef"])[0]
    np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))


def test_ode_and_val_steps(setup):
    _, trainer, state, traj = setup
    idx = jnp.arange(N_SIGNALS)
    loss, s = trainer.ode_train_step(state, traj, idx)
    assert np.isfinite(float(loss))
    mse_in, mse_out = trainer.val_step(s, traj, idx)
    assert np.isfinite(float(mse_in)) and np.isfinite(float(mse_out))


def test_refit_latents_protocol(setup):
    cfg, trainer, state, traj = setup
    loader = TrajectoryLoader(
        lambda i: np.asarray(traj[i]),
        indices=range(N_SIGNALS),
        coords=np.asarray(trainer.coords),
        batch_size=2,
    )
    val_state = trainer.refit_latents(state, loader, num_epochs=3, dp=0.5)
    # Fresh table, fitted without touching the decoder.
    leaf0 = jax.tree_util.tree_leaves(state.params["nef"])[0]
    leaf1 = jax.tree_util.tree_leaves(val_state.params["nef"])[0]
    np.testing.assert_array_equal(np.asarray(leaf0), np.asarray(leaf1))
    moved = jnp.abs(
        val_state.params["autodecoder"]["a"] - jnp.ones_like(val_state.params["autodecoder"]["a"])
    ).max()
    assert float(moved) > 0
