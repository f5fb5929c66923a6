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
        self.device_cache = False
        self._dev_batches: dict = {}
        self._dev_signals: dict = {}

    def __len__(self) -> int:
        return len(self.indices) // self.batch_size  # drop_last=True

    def enable_device_cache(self, max_bytes: int = 2 << 30) -> bool:
        """Keep trajectories resident on the accelerator across epochs.

        Trajectory content is static (the npz cache is immutable), so on a
        remote-dispatch TPU platform re-transferring each batch every epoch pays
        tunnel bandwidth + host stacking for no reason — measured ~2-4 s/epoch on
        IHC (results/r3/ihc64_s0, 64 signals x batch 1). Deterministic batches
        (``shuffle=False`` or ``batch_size==1``) are cached whole per ids-tuple;
        shuffled multi-signal batches are cached per signal and stacked on device
        (a device-local copy, no host transfer). Returns False (and stays off)
        when the projected resident size exceeds ``max_bytes``. Single-device
        only — callers gate on ``len(jax.devices()) == 1``; multi-device batch
        sharding keeps the host path.
        """
        probe = self.fetch(int(self.indices[0]))
        if self.max_frames is not None:
            probe = probe[: self.max_frames]
        if probe.nbytes * len(self.indices) > max_bytes:
            return False
        self.device_cache = True
        return True

    def _device_batch(self, ids):
        import jax
        import jax.numpy as jnp

        key = tuple(int(i) for i in ids)
        if key in self._dev_batches:
            return self._dev_batches[key]
        if len(key) == 1 or not self.shuffle:
            # Deterministic ids-tuples (val loaders, batch_size 1): bounded
            # number of keys, cache the stacked batch itself.
            trajs = np.stack([self.fetch(i) for i in key])
            if self.max_frames is not None:
                trajs = trajs[:, : self.max_frames]
            self._dev_batches[key] = jax.device_put(trajs)
            return self._dev_batches[key]
        # Shuffled multi-signal batches: ids-tuples vary per epoch, so cache per
        # signal and stack on device.
        for i in key:
            if i not in self._dev_signals:
                t = self.fetch(i)
                if self.max_frames is not None:
                    t = t[: self.max_frames]
                self._dev_signals[i] = jax.device_put(t)
        return jnp.stack([self._dev_signals[i] for i in key])

    def __iter__(self):
        order = self.indices.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        for b in range(len(self)):
            ids = order[b * self.batch_size : (b + 1) * self.batch_size]
            if self.device_cache:
                yield self._device_batch(ids), self.coords, ids
                continue
            if self.batch_fetch is not None:
                trajs = self.batch_fetch(ids)
            else:
                trajs = np.stack([self.fetch(int(i)) for i in ids])
            if self.max_frames is not None:
                trajs = trajs[:, : self.max_frames]
            yield trajs, self.coords, ids
