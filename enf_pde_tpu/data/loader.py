"""Minimal numpy batch loader (replaces the reference's torch DataLoader).

Yields ``(trajectories [b, T, *spatial, C], coords, indices)`` batches — the same
tuple layout the reference's ``numpy_collate`` produces — with shuffling, drop-last
semantics, and an optional device-placement hook (e.g. ``parallel.shard_batch``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

__all__ = ["TrajectoryLoader"]


class TrajectoryLoader:
    def __init__(
        self,
        fetch: Callable[[int], np.ndarray],
        indices: Sequence[int],
        coords: np.ndarray,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        max_frames: Optional[int] = None,
        batch_fetch: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        """``batch_fetch``: optional vectorized fetch (e.g. the native prefetcher);
        takes an id array and returns the stacked trajectories."""
        self.fetch = fetch
        self.batch_fetch = batch_fetch
        self.indices = np.asarray(list(indices))
        self.coords = np.asarray(coords)
        self.batch_size = min(batch_size, len(self.indices))
        self.shuffle = shuffle
        self.max_frames = max_frames
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.indices) // self.batch_size  # drop_last=True

    def __iter__(self):
        order = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        for b in range(len(self)):
            ids = order[b * self.batch_size : (b + 1) * self.batch_size]
            if self.batch_fetch is not None:
                trajs = self.batch_fetch(ids)
            else:
                trajs = np.stack([self.fetch(int(i)) for i in ids])
            if self.max_frames is not None:
                trajs = trajs[:, : self.max_frames]
            yield trajs, self.coords, ids
