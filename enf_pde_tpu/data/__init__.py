"""Dataset registry: generate-on-first-touch, cache to disk, load as numpy batches.

API parity with reference ``experiments/fitting/datasets/__init__.py``:
``get_dataloader(dataset_cfg) -> (train_loader, test_loader)`` where each loader
yields ``(traj [b, T, *spatial, C], coords, indices)``. Coordinates for each geometry
follow the reference entry points: planar datasets use a [-1, 1]^2 grid, spherical
datasets the (phi, theta) generation grid, and the ball a (phi, theta, r) meshgrid.

All solvers are JAX-native (see the per-module docstrings); the torch / py-pde /
Dedalus host-side dependencies of the reference are gone. If the active accelerator
backend cannot run a solver op (e.g. the remote-TPU platform lacks complex FFT),
generation transparently falls back to a CPU subprocess (``data/generate.py``, which
doubles as the pre-generation CLI — the analogue of the reference's
``gen_navier_stokes.py``).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from enf_pde_tpu.data.cache import TrajectoryCache, test_seed
from enf_pde_tpu.data.loader import TrajectoryLoader

__all__ = [
    "get_dataloader",
    "planar_coords",
    "angular_coords",
    "ball_coords",
    "TrajectoryLoader",
    "TrajectoryCache",
    "test_seed",
]


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


def get_dataloader(dataset_cfg) -> Tuple[TrajectoryLoader, TrajectoryLoader]:
    from enf_pde_tpu.data.registry import dataset_spec

    name = dataset_cfg.name
    spec = dataset_spec(name, dataset_cfg)
    root = os.path.join(dataset_cfg.path, spec.cache_name)

    cache_tr = TrajectoryCache(
        os.path.join(root, "train"),
        spec.gen_train,
        batch_size_gen=spec.batch_size_gen,
        subprocess_fallback=(name, "train", dataset_cfg.path, dataset_cfg.to_json()),
    )
    cache_ts = TrajectoryCache(
        os.path.join(root, "test"),
        spec.gen_test,
        batch_size_gen=spec.batch_size_gen,
        subprocess_fallback=(name, "test", dataset_cfg.path, dataset_cfg.to_json()),
    )

    fetch_tr = lambda i: spec.postprocess(cache_tr.get(i))
    fetch_ts = lambda i: spec.postprocess(cache_ts.get(i))

    def _native_batch_fetch(cache):
        """Batch fetch via the native (C++) prefetcher; None if unavailable."""
        from enf_pde_tpu.data.native_loader import NativePrefetcher, native_available

        if not native_available():
            return None
        prefetcher = NativePrefetcher(num_threads=2)

        def batch_fetch(ids):
            cache.ensure(ids)
            paths = [cache.ensure_raw(int(i)) for i in ids]
            shape = cache.shape()
            block = prefetcher.load_batch(paths, shape)
            return np.stack([spec.postprocess(t) for t in block])

        return batch_fetch

    train = TrajectoryLoader(
        fetch_tr,
        indices=range(dataset_cfg.num_signals_train),
        coords=spec.coords,
        batch_size=dataset_cfg.batch_size,
        shuffle=True,
        seed=0,
        max_frames=spec.n_frames_train,
        batch_fetch=_native_batch_fetch(cache_tr),
    )
    test = TrajectoryLoader(
        fetch_ts,
        indices=range(dataset_cfg.num_signals_test),
        coords=spec.coords,
        batch_size=dataset_cfg.batch_size,
        shuffle=False,
        seed=1,
        batch_fetch=_native_batch_fetch(cache_ts),
    )
    # Pre-generation hooks: forking a generation subprocess mid-training (after the
    # accelerator runtime spawns its thread pool) risks fork deadlocks; entry points
    # call these once at startup instead.
    train.ensure_all = lambda: cache_tr.ensure(train.indices)
    test.ensure_all = lambda: cache_ts.ensure(test.indices)
    return train, test
