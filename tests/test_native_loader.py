"""Native (C++) trajectory prefetcher tests: build, correctness, cache integration."""

import numpy as np
import pytest

from enf_pde_tpu.data.cache import TrajectoryCache
from enf_pde_tpu.data.native_loader import NativePrefetcher, build_library, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def test_build_and_roundtrip(tmp_path):
    ref = np.random.RandomState(0).rand(3, 4, 5).astype(np.float32)
    path = str(tmp_path / "a.raw")
    ref.tofile(path)

    p = NativePrefetcher(num_threads=2)
    t = p.submit(path)
    out = p.fetch(t, ref.shape)
    np.testing.assert_array_equal(out, ref)


def test_batch_overlapped_reads(tmp_path):
    shape = (2, 8, 8, 1)
    paths = []
    refs = []
    for i in range(6):
        arr = np.full(shape, float(i), dtype=np.float32)
        path = str(tmp_path / f"t{i}.raw")
        arr.tofile(path)
        paths.append(path)
        refs.append(arr)
    p = NativePrefetcher(num_threads=3)
    out = p.load_batch(paths, shape)
    np.testing.assert_array_equal(out, np.stack(refs))


def test_fetch_errors(tmp_path):
    p = NativePrefetcher()
    t = p.submit(str(tmp_path / "missing.raw"))
    with pytest.raises(IOError):
        p.fetch(t, (4,))
    # Size mismatch.
    arr = np.zeros(8, dtype=np.float32)
    path = str(tmp_path / "b.raw")
    arr.tofile(path)
    t = p.submit(path)
    with pytest.raises(IOError):
        p.fetch(t, (4,))


def test_cache_writes_raw_companions(tmp_path):
    def gen(ids):
        return np.stack([np.full((2, 3, 3, 1), float(i), dtype=np.float32) for i in ids])

    cache = TrajectoryCache(str(tmp_path / "c"), gen, batch_size_gen=2)
    data = cache.get(0)
    assert cache.shape() == (2, 3, 3, 1)
    raw = np.fromfile(cache.raw_path(0), dtype=np.float32).reshape(cache.shape())
    np.testing.assert_array_equal(raw, data)

    p = NativePrefetcher()
    out = p.load_batch([cache.ensure_raw(i) for i in (0, 1)], cache.shape())
    np.testing.assert_array_equal(out[1], cache.get(1))
