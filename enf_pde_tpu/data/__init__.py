"""Dataset registry: generate-on-first-touch, cache to disk, load as numpy batches.

API parity with reference ``experiments/fitting/datasets/__init__.py``:
``get_dataloader(dataset_cfg) -> (train_loader, test_loader)`` where each loader
yields ``(traj [b, T, *spatial, C], coords, indices)``. Coordinates for each geometry
follow the reference entry points: planar datasets use a [-1, 1]^2 grid, spherical
datasets the (phi, theta) generation grid, and the ball a (phi, theta, r) meshgrid.

All solvers are JAX-native (see the per-module docstrings); the torch / py-pde /
Dedalus host-side dependencies of the reference are gone. Shallow water runs on the
spectral rotating shallow-water solver in ``shallow_water.py``; internally heated
convection uses the documented reduced-order generator in ``ihc.py``.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from enf_pde_tpu.data.cache import TrajectoryCache, test_seed
from enf_pde_tpu.data.cahn_hilliard import generate_ch_trajectories
from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories
from enf_pde_tpu.data.diffusion_sphere import (
    generate_sphere_diffusion_trajectories,
    sphere_diffusion_grid,
)
from enf_pde_tpu.data.loader import TrajectoryLoader
from enf_pde_tpu.data.navier_stokes import generate_ns_trajectories

__all__ = ["get_dataloader", "planar_coords", "TrajectoryLoader", "TrajectoryCache", "test_seed"]


def planar_coords(h: int, w: int, lo: float = -1.0, hi: float = 1.0) -> np.ndarray:
    """[-1, 1]^2 coordinate grid, flattened row-major to match frame flattening."""
    u = np.linspace(lo, hi, h)
    v = np.linspace(lo, hi, w)
    U, V = np.meshgrid(u, v, indexing="ij")
    return np.stack([U, V], axis=-1).reshape(-1, 2).astype(np.float32)


def angular_coords(phi: np.ndarray, theta: np.ndarray) -> np.ndarray:
    P, T = np.meshgrid(phi, theta, indexing="ij")
    return np.stack([P, T], axis=-1).reshape(-1, 2).astype(np.float32)


def ball_coords(nphi: int, ntheta: int, nr: int) -> np.ndarray:
    phi = np.linspace(0, 2 * np.pi, nphi, endpoint=False)
    theta = np.linspace(1e-3, np.pi, ntheta, endpoint=False)
    r = np.linspace(0, 1, nr)
    P, T, R = np.meshgrid(phi, theta, r, indexing="ij")
    return np.stack([P, T, R], axis=-1).reshape(-1, 3).astype(np.float32)


def _make_loaders(
    cache_train: TrajectoryCache,
    cache_test: TrajectoryCache,
    coords: np.ndarray,
    dataset_cfg,
    n_frames_train: int | None,
) -> Tuple[TrajectoryLoader, TrajectoryLoader]:
    n_train = dataset_cfg.num_signals_train
    n_test = dataset_cfg.num_signals_test
    train = TrajectoryLoader(
        cache_train.get,
        indices=range(n_train),
        coords=coords,
        batch_size=dataset_cfg.batch_size,
        shuffle=True,
        seed=0,
        max_frames=n_frames_train,
    )
    test = TrajectoryLoader(
        cache_test.get,
        indices=range(n_test),
        coords=coords,
        batch_size=dataset_cfg.batch_size,
        shuffle=False,
        seed=1,
    )
    return train, test


def get_dataloader(dataset_cfg) -> Tuple[TrajectoryLoader, TrajectoryLoader]:
    name = dataset_cfg.name
    root = os.path.join(dataset_cfg.path, name)

    if name in ("navier_stokes", "navier_stokes_long"):
        t_horizon = (
            20
            if name == "navier_stokes"
            else dataset_cfg.traj_len_train + dataset_cfg.traj_len_out_horizon
        )

        def gen_train(ids):
            return generate_ns_trajectories(ids, t_horizon=t_horizon)

        def gen_test(ids):
            return generate_ns_trajectories(
                np.asarray([test_seed(i) for i in ids]), t_horizon=t_horizon
            )

        cache_tr = TrajectoryCache(os.path.join(root, "train"), gen_train, batch_size_gen=16)
        cache_ts = TrajectoryCache(os.path.join(root, "test"), gen_test, batch_size_gen=16)
        return _make_loaders(cache_tr, cache_ts, planar_coords(64, 64), dataset_cfg, 20)

    if name == "diffusion_plane":
        def gen_train(ids):
            return generate_diffusion_trajectories(ids, test=False)

        def gen_test(ids):
            return generate_diffusion_trajectories(
                np.asarray([test_seed(i) for i in ids]), test=True
            )

        cache_tr = TrajectoryCache(os.path.join(root, "train"), gen_train, batch_size_gen=32)
        cache_ts = TrajectoryCache(os.path.join(root, "test"), gen_test, batch_size_gen=32)
        return _make_loaders(cache_tr, cache_ts, planar_coords(64, 64), dataset_cfg, 20)

    if name == "cahn_hilliard":
        def gen_train(ids):
            return generate_ch_trajectories(ids)

        def gen_test(ids):
            return generate_ch_trajectories(np.asarray([test_seed(i) for i in ids]))

        cache_tr = TrajectoryCache(os.path.join(root, "train"), gen_train, batch_size_gen=8)
        cache_ts = TrajectoryCache(os.path.join(root, "test"), gen_test, batch_size_gen=8)
        return _make_loaders(cache_tr, cache_ts, planar_coords(64, 64), dataset_cfg, 20)

    if name == "diff_sphere":
        grid = sphere_diffusion_grid()

        def gen_train(ids):
            return generate_sphere_diffusion_trajectories(ids, grid=grid)

        def gen_test(ids):
            return generate_sphere_diffusion_trajectories(
                np.asarray([test_seed(i) for i in ids]), grid=grid
            )

        coords = angular_coords(grid.phi, grid.theta)
        cache_tr = TrajectoryCache(os.path.join(root, "train"), gen_train, batch_size_gen=16)
        cache_ts = TrajectoryCache(os.path.join(root, "test"), gen_test, batch_size_gen=16)
        return _make_loaders(cache_tr, cache_ts, coords, dataset_cfg, 20)

    if name in ("shallow_water", "shallow_water_low_res"):
        from enf_pde_tpu.data.shallow_water import get_shallow_water_loaders

        return get_shallow_water_loaders(dataset_cfg, low_res=name.endswith("low_res"))

    if name == "ihc":
        from enf_pde_tpu.data.ihc import get_ihc_loaders

        return get_ihc_loaders(dataset_cfg)

    raise ValueError(f"Unknown dataset name: {name!r}")
