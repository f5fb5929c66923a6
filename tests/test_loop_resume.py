"""TrainLoop integration: epoch loop, checkpointing, and resume."""

import numpy as np
import pytest

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.data.loader import TrajectoryLoader
from enf_pde_tpu.train.checkpoint import CheckpointManager
from enf_pde_tpu.train.logging import MetricLogger
from enf_pde_tpu.train.loop import TrainLoop
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

from tests.test_train_e2e import tiny_cfg, SIZE


def _make_loop(cfg, tmp_path, trainer=None):
    decoder, ode_model = build_models(cfg)
    coords = planar_coords(SIZE, SIZE)
    trainer = trainer or MetaSGDTrainer(cfg, decoder, ode_model, coords, seed=0)
    traj = generate_diffusion_trajectories(np.arange(4), size=SIZE)[:, :8]
    traj = traj / (np.abs(traj).max() + 1e-8)
    loader = TrajectoryLoader(
        lambda i: traj[i], indices=range(4), coords=coords, batch_size=2
    )
    logger = MetricLogger(str(tmp_path / "logs"))
    ckpt = CheckpointManager(str(tmp_path / "logs"), every_n_epochs=1, keep_n=2)
    return trainer, TrainLoop(trainer, loader, loader, logger, ckpt)


@pytest.mark.slow
def test_loop_runs_and_resumes(tmp_path):
    cfg = tiny_cfg()
    cfg.training.num_epochs = 2
    cfg.training.nef.train_until_epoch = 10
    cfg.training.ode.train_from_epoch = 100
    cfg.test.test_interval = 99
    cfg.test.test_dp_interval = 99
    cfg.set_path("logging.log_dir", str(tmp_path / "logs"))
    cfg.set_path("logging.log_every_n_steps", 1)

    trainer, loop = _make_loop(cfg, tmp_path)
    state = loop.run(2)
    loop.checkpoints.wait()
    assert loop.checkpoints.latest_epoch() == 2

    # Resume continues from epoch 3.
    cfg2 = cfg.copy()
    cfg2.logging.resume = True
    trainer2, loop2 = _make_loop(cfg2, tmp_path)
    state2 = loop2.run(3)
    loop2.checkpoints.wait()
    assert loop2.checkpoints.latest_epoch() == 3

    # Metrics landed in the JSONL log.
    metrics = (tmp_path / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    assert any("train_mse_epoch" in line for line in metrics)

    # The checkpoint stores the config alongside the state and restore surfaces it.
    saved = loop2.checkpoints.restore_config()
    assert saved["training"]["num_epochs"] == cfg2.training.num_epochs


@pytest.mark.slow  # figure plumbing stays fast-covered by test_visualization_smoke;
# this additionally drives the trainer's full visualize_epoch (rollout + decode)
def test_visualize_epoch_writes_figure(tmp_path):
    import os

    cfg = tiny_cfg()
    cfg.set_path("logging.log_dir", str(tmp_path / "logs"))
    trainer, loop = _make_loop(cfg, tmp_path)
    state = trainer.init_state()
    path = loop.visualize_epoch(state, epoch=1)
    assert os.path.exists(path)
    metrics = (tmp_path / "logs" / "metrics.jsonl").read_text()
    assert "rollout_figure" in metrics
