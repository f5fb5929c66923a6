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
        subprocess_fallback: tuple | None = None,
    ):
        """``subprocess_fallback``: optional ``(dataset_name, group, path_root,
        dataset_cfg_json)``; when in-process generation fails with a backend error
        (e.g. an accelerator missing complex FFT), generation re-runs in a CPU
        subprocess via ``enf_pde_tpu.data.generate``.
        """
        self.root = root
        self.generate_batch = generate_batch
        self.batch_size_gen = batch_size_gen
        self.subprocess_fallback = subprocess_fallback
        self._force_subprocess = False
        if subprocess_fallback is not None:
            # On non-CPU backends, generate in a CPU subprocess from the start: a
            # failed in-process attempt (e.g. complex FFT on a remote-TPU platform)
            # can leave the accelerator client unusable for the training run.
            try:
                import jax

                self._force_subprocess = jax.default_backend() != "cpu"
            except Exception:
                pass
        os.makedirs(root, exist_ok=True)
        self._mem: dict[int, np.ndarray] = {}

    def _path(self, idx: int) -> str:
        return os.path.join(self.root, f"traj_{idx:06d}.npz")

    def raw_path(self, idx: int) -> str:
        """Flat float32 companion file consumed by the native prefetcher."""
        return os.path.join(self.root, f"traj_{idx:06d}.raw")

    def shape(self):
        """Per-trajectory shape, recorded when the first trajectory is written."""
        import json

        meta = os.path.join(self.root, "shape.json")
        if not os.path.exists(meta):
            return None
        with open(meta) as f:
            return tuple(json.load(f))

    def _write_traj(self, idx: int, traj) -> None:
        import json

        arr = np.asarray(traj, dtype=np.float32)
        tmp = self._path(idx) + ".tmp.npz"
        np.savez_compressed(tmp, data=arr)
        os.replace(tmp, self._path(idx))
        # Raw companion for the native prefetcher (no decompression on the hot path).
        tmp_raw = self.raw_path(idx) + ".tmp"
        arr.tofile(tmp_raw)
        os.replace(tmp_raw, self.raw_path(idx))
        meta = os.path.join(self.root, "shape.json")
        if not os.path.exists(meta):
            with open(meta, "w") as f:
                json.dump(list(arr.shape), f)

    def ensure_raw(self, idx: int) -> str:
        """Make sure the raw companion exists (regenerate from npz if missing)."""
        if not os.path.exists(self.raw_path(idx)):
            arr = self.get(idx)
            tmp_raw = self.raw_path(idx) + ".tmp"
            np.asarray(arr, dtype=np.float32).tofile(tmp_raw)
            os.replace(tmp_raw, self.raw_path(idx))
            import json

            meta = os.path.join(self.root, "shape.json")
            if not os.path.exists(meta):
                with open(meta, "w") as f:
                    json.dump(list(np.asarray(arr).shape), f)
        return self.raw_path(idx)

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
        if self._force_subprocess:
            self._generate_subprocess(missing)
            return
        try:
            block = self.generate_batch(np.asarray(missing))
        except Exception as e:
            if self.subprocess_fallback is None:
                raise
            print(f"[cache] in-process generation failed ({type(e).__name__}); "
                  f"falling back to CPU subprocess")
            self._force_subprocess = True
            self._generate_subprocess(missing)
            return
        for i, traj in zip(missing, block):
            self._write_traj(i, traj)

    def _generate_subprocess(self, ids):
        import subprocess
        import sys

        name, group, path_root, cfg_json = self.subprocess_fallback
        env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
        cmd = [
            sys.executable, "-m", "enf_pde_tpu.data.generate",
            name, "--group", group, "--path", path_root,
            "--ids", ",".join(str(int(i)) for i in ids),
            "--dataset-cfg", cfg_json,
        ]
        subprocess.run(cmd, check=True, env=env)
        still_missing = [i for i in ids if not os.path.exists(self._path(i))]
        if still_missing:
            raise RuntimeError(f"subprocess generation left trajectories missing: {still_missing}")

    def ensure(self, ids: Sequence[int]):
        for i in ids:
            if not os.path.exists(self._path(i)):
                self._generate_block(i)
