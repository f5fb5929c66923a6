"""Generate-on-first-touch trajectory cache (npz files, one per trajectory).

Replaces the reference's ``shelve`` caches (``datasets/__init__.py:88-93``) with plain
``.npz`` files: concurrency-safe enough for single-host runs, portable, mmap-friendly.
Trajectories are generated in batches so the accelerator-side solvers amortize
compilation and stay batched on the MXU.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np

__all__ = ["TrajectoryCache", "test_seed"]

_MAX_INT32 = np.iinfo(np.int32).max


def test_seed(index: int) -> int:
    """Seed-disjoint test split: ``max_int32 - index`` (reference ``pdes.py:273``)."""
    return _MAX_INT32 - index


class TrajectoryCache:
    """Disk cache of trajectories keyed by integer id.

    Args:
        root: cache directory.
        generate_batch: ``fn(ids: np.ndarray) -> array [len(ids), T, *spatial, C]``.
        batch_size_gen: how many trajectories to generate per solver invocation.
    """

    def __init__(
        self,
        root: str,
        generate_batch: Callable[[np.ndarray], np.ndarray],
        batch_size_gen: int = 32,
    ):
        self.root = root
        self.generate_batch = generate_batch
        self.batch_size_gen = batch_size_gen
        os.makedirs(root, exist_ok=True)
        self._mem: dict[int, np.ndarray] = {}

    def _path(self, idx: int) -> str:
        return os.path.join(self.root, f"traj_{idx:06d}.npz")

    def get(self, idx: int) -> np.ndarray:
        if idx in self._mem:
            return self._mem[idx]
        path = self._path(idx)
        if not os.path.exists(path):
            self._generate_block(idx)
        data = np.load(path)["data"]
        self._mem[idx] = data
        return data

    def _generate_block(self, idx: int):
        """Generate the whole aligned block containing ``idx``."""
        start = (idx // self.batch_size_gen) * self.batch_size_gen
        ids = np.arange(start, start + self.batch_size_gen)
        missing = [i for i in ids if not os.path.exists(self._path(i))]
        if not missing:
            return
        block = self.generate_batch(np.asarray(missing))
        for i, traj in zip(missing, block):
            tmp = self._path(i) + ".tmp.npz"
            np.savez_compressed(tmp, data=np.asarray(traj, dtype=np.float32))
            os.replace(tmp, self._path(i))

    def ensure(self, ids: Sequence[int]):
        for i in ids:
            if not os.path.exists(self._path(i)):
                self._generate_block(i)
