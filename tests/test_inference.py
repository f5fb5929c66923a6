"""Forecaster API: fit -> rollout -> decode at training and super-resolution grids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.inference import Forecaster

from tests.test_train_e2e import tiny_cfg, SIZE


@pytest.fixture(scope="module")
def forecaster():
    cfg = tiny_cfg()
    coords = planar_coords(SIZE, SIZE)
    fc = Forecaster(cfg, state=None, coords=coords)
    fc.state = fc.trainer.init_state()
    return fc


def test_forecast_shapes(forecaster):
    frames = generate_diffusion_trajectories(np.arange(2), size=SIZE)[:, 0]
    frames = frames / (np.abs(frames).max() + 1e-8)
    out = forecaster.forecast(frames, num_frames=5)
    assert out.shape == (2, 5, SIZE * SIZE, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_forecast_super_resolution(forecaster):
    frames = generate_diffusion_trajectories(np.arange(2), size=SIZE)[:, 0]
    frames = frames / (np.abs(frames).max() + 1e-8)
    hi = planar_coords(2 * SIZE, 2 * SIZE)
    out = forecaster.forecast(frames, num_frames=3, coords=hi)
    assert out.shape == (2, 3, 4 * SIZE * SIZE, 1)


def test_sparse_observation_fit(forecaster):
    frames = generate_diffusion_trajectories(np.arange(2), size=SIZE)[:, 0]
    frames = frames / (np.abs(frames).max() + 1e-8)
    out = forecaster.forecast(frames, num_frames=2, dp=0.5)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_decode_matches_chunked():
    """Multi-device Forecaster decode (coordinate-sharded) == single-device chunked."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_cfg()
    coords = planar_coords(SIZE, SIZE)
    fc_mesh = Forecaster(cfg, state=None, coords=coords)  # coord_mesh="auto"
    fc_mesh.state = fc_mesh.trainer.init_state()
    assert fc_mesh._sharded_decode is not None
    fc_single = Forecaster(cfg, state=None, coords=coords, coord_mesh=None)
    fc_single.state = fc_single.trainer.init_state()
    assert fc_single._sharded_decode is None

    frames = generate_diffusion_trajectories(np.arange(2), size=SIZE)[:, 0]
    frames = frames / (np.abs(frames).max() + 1e-8)
    fitted = fc_single.fit(frames)
    traj = fc_single.rollout(fitted, num_frames=3)
    out_single = fc_single.decode(traj)
    out_mesh = fc_mesh.decode(traj)
    np.testing.assert_allclose(np.asarray(out_mesh), np.asarray(out_single), atol=1e-6)
