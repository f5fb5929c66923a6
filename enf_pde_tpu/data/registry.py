"""Per-dataset generator/coordinate registry shared by loaders and the generation CLI.

``dataset_spec(name)`` returns everything needed to build caches and loaders:
train/test batch generators, the coordinate grid, per-split frame handling, and the
solver batch size. ``experiments.fit`` consumes this via ``data.get_dataloader``;
``data.generate`` (the pre-generation CLI, and the CPU-subprocess fallback used when
the accelerator backend lacks an op such as complex FFT) consumes it directly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

from enf_pde_tpu.data.cache import test_seed

__all__ = ["DatasetSpec", "dataset_spec", "DATASET_NAMES"]

DATASET_NAMES = (
    "navier_stokes",
    "navier_stokes_long",
    "diffusion_plane",
    "cahn_hilliard",
    "diff_sphere",
    "shallow_water",
    "shallow_water_low_res",
    "ihc",
)


class DatasetSpec(NamedTuple):
    gen_train: Callable[[np.ndarray], np.ndarray]
    gen_test: Callable[[np.ndarray], np.ndarray]
    coords: np.ndarray
    n_frames_train: Optional[int]  # truncation applied to the train split
    batch_size_gen: int
    cache_name: str  # subdirectory under dataset path (shared between variants)
    postprocess: Callable[[np.ndarray], np.ndarray]  # applied per trajectory at load


def _identity(x: np.ndarray) -> np.ndarray:
    return x


def dataset_spec(name: str, dataset_cfg=None) -> DatasetSpec:
    from enf_pde_tpu.data import angular_coords, ball_coords, planar_coords

    if name in ("navier_stokes", "navier_stokes_long"):
        from enf_pde_tpu.data.navier_stokes import generate_ns_trajectories

        if name == "navier_stokes":
            t_horizon = 20
        else:
            t_horizon = dataset_cfg.traj_len_train + dataset_cfg.traj_len_out_horizon

        return DatasetSpec(
            gen_train=lambda ids: generate_ns_trajectories(ids, t_horizon=t_horizon),
            gen_test=lambda ids: generate_ns_trajectories(
                np.asarray([test_seed(i) for i in ids]), t_horizon=t_horizon
            ),
            coords=planar_coords(64, 64),
            n_frames_train=20,
            batch_size_gen=16,
            cache_name=name,
            postprocess=_identity,
        )

    if name == "diffusion_plane":
        from enf_pde_tpu.data.diffusion_plane import generate_diffusion_trajectories

        return DatasetSpec(
            gen_train=lambda ids: generate_diffusion_trajectories(ids, test=False),
            gen_test=lambda ids: generate_diffusion_trajectories(
                np.asarray([test_seed(i) for i in ids]), test=True
            ),
            coords=planar_coords(64, 64),
            n_frames_train=20,
            batch_size_gen=32,
            cache_name=name,
            postprocess=_identity,
        )

    if name == "cahn_hilliard":
        from enf_pde_tpu.data.cahn_hilliard import generate_ch_trajectories

        return DatasetSpec(
            gen_train=lambda ids: generate_ch_trajectories(ids),
            gen_test=lambda ids: generate_ch_trajectories(
                np.asarray([test_seed(i) for i in ids])
            ),
            coords=planar_coords(64, 64),
            n_frames_train=20,
            batch_size_gen=8,
            cache_name=name,
            postprocess=_identity,
        )

    if name == "diff_sphere":
        from enf_pde_tpu.data.diffusion_sphere import (
            generate_sphere_diffusion_trajectories,
            sphere_diffusion_grid,
        )

        grid = sphere_diffusion_grid()
        return DatasetSpec(
            gen_train=lambda ids: generate_sphere_diffusion_trajectories(ids, grid=grid),
            gen_test=lambda ids: generate_sphere_diffusion_trajectories(
                np.asarray([test_seed(i) for i in ids]), grid=grid
            ),
            coords=angular_coords(grid.phi, grid.theta),
            n_frames_train=20,
            batch_size_gen=16,
            cache_name=name,
            postprocess=_identity,
        )

    if name in ("shallow_water", "shallow_water_low_res"):
        from enf_pde_tpu.data.shallow_water import _avg_pool_2x2, generate_sw_trajectories
        from enf_pde_tpu.data.sphere_harmonics import SphereGrid

        nphi, ntheta = 192, 96
        grid = SphereGrid(nphi, ntheta, lmax=(2 * ntheta) // 3)
        if name.endswith("low_res"):
            coarse = SphereGrid(nphi // 2, ntheta // 2)
            coords = angular_coords(coarse.phi, coarse.theta)
            post = lambda t: _avg_pool_2x2(t[6:])
        else:
            coords = angular_coords(grid.phi, grid.theta)
            post = lambda t: t[6:]
        return DatasetSpec(
            gen_train=lambda ids: generate_sw_trajectories(ids, grid=grid),
            gen_test=lambda ids: generate_sw_trajectories(
                np.asarray([test_seed(i) for i in ids]), grid=grid
            ),
            coords=coords,
            n_frames_train=None,  # the 6-frame skip already handled by postprocess
            batch_size_gen=4,
            cache_name="shallow_water",  # both resolutions share the cache
            postprocess=post,
        )

    if name == "ihc":
        from enf_pde_tpu.data.ball_convection import BallConvectionSolver
        from enf_pde_tpu.data.ihc import generate_ihc_trajectories

        # Ra 1e6 Boussinesq convection (reference pdes.py:738-846). Solver setup is a
        # few seconds of basis building — construct lazily on the first generation.
        _solver: list = []

        def _get_solver():
            if not _solver:
                _solver.append(BallConvectionSolver())
            return _solver[0]

        return DatasetSpec(
            gen_train=lambda ids: generate_ihc_trajectories(ids, _get_solver()),
            gen_test=lambda ids: generate_ihc_trajectories(
                np.asarray([test_seed(i) for i in ids]), _get_solver()
            ),
            coords=ball_coords(48, 24, 24),
            n_frames_train=None,
            batch_size_gen=2,  # trajectories are minutes each; keep cache writes fresh
            cache_name="ihc_convection",  # new physics -> fresh cache
            postprocess=lambda t: t[6:],
        )

    raise ValueError(f"Unknown dataset name: {name!r}")
