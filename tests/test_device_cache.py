"""Device-resident loader cache: identical batches/training to the host path.

The cache exists for the remote-dispatch TPU platform (no per-step host->device
transfer of static trajectories); numerically it must be a no-op. Verified here on
the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np

from enf_pde_tpu.builders import build_models
from enf_pde_tpu.data import planar_coords
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.data.loader import TrajectoryLoader
from enf_pde_tpu.train.loop import TrainLoop
from enf_pde_tpu.train.meta_sgd import MetaSGDTrainer

from tests.test_train_e2e import tiny_cfg, SIZE


def _traj_bank(n=4, frames=6):
    traj = generate_diffusion_trajectories(np.arange(n), size=SIZE)[:, :frames]
    return traj / (np.abs(traj).max() + 1e-8)


def _loader(traj, batch_size, shuffle, seed=0, max_frames=None):
    return TrajectoryLoader(
        lambda i: traj[i],
        indices=range(traj.shape[0]),
        coords=planar_coords(SIZE, SIZE),
        batch_size=batch_size,
        shuffle=shuffle,
        seed=seed,
        max_frames=max_frames,
    )


def test_device_cache_batches_identical():
    traj = _traj_bank()
    for batch_size, shuffle in [(1, True), (2, True), (2, False)]:
        host = _loader(traj, batch_size, shuffle, max_frames=5)
        dev = _loader(traj, batch_size, shuffle, max_frames=5)
        assert dev.enable_device_cache()
        for epoch in range(2):  # 2nd epoch exercises the cache-hit path
            for (ht, hc, hi), (dt, dc, di) in zip(host, dev):
                assert isinstance(dt, jax.Array)
                np.testing.assert_array_equal(hi, di)
                np.testing.assert_array_equal(ht, np.asarray(dt))
                np.testing.assert_array_equal(hc, dc)


def test_device_cache_respects_size_cap():
    traj = _traj_bank()
    ldr = _loader(traj, 2, True)
    assert not ldr.enable_device_cache(max_bytes=8)
    assert not ldr.device_cache
    t, _, _ = next(iter(ldr))
    assert isinstance(t, np.ndarray)  # host path kept


def test_train_epoch_identical_with_device_cache(tmp_path):
    cfg = tiny_cfg()
    cfg.training.nef.train_until_epoch = 10
    cfg.training.ode.train_from_epoch = 100
    cfg.set_path("logging.log_every_n_steps", 1000)

    traj = _traj_bank()
    losses = {}
    for cached in (False, True):
        decoder, ode_model = build_models(cfg)
        trainer = MetaSGDTrainer(cfg, decoder, ode_model, planar_coords(SIZE, SIZE), seed=0)
        loader = _loader(traj, 2, True, seed=0)
        if cached:
            assert loader.enable_device_cache()
        loop = TrainLoop(trainer, loader, loader)
        state = trainer.init_state()
        state = loop.train_epoch(state, epoch=1)
        v_in, v_out = loop._eval_loader(state, loader, trainer.val_step)
        losses[cached] = (v_in, v_out)
    # Same data, same RNG threading -> bitwise-identical epoch on CPU.
    assert losses[False] == losses[True]
