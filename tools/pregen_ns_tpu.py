"""Batch-generate the Navier-Stokes cache ON THE TPU toward the paper-scale
8192/512 signal regime (`/root/reference/experiments/fitting/config_navier_stokes_nonmaml.yaml:27-28`).

The NS solver (`data/navier_stokes.py`) is a jitted `lax.scan` over complex-FFT
states. The cache layer preemptively routes generation to a CPU subprocess on
non-CPU backends (`data/cache.py:53-57`) because a failed in-process attempt can
wedge the remote-TPU client — but single-core CPU generation costs ~15 s per
trajectory (~37 h for the full set, `tools/pregen_ns8192.sh`). This driver
deliberately runs in-process on the accelerator with large solver batches, after
`--probe` confirms complex FFT works on the current platform.

Usage (chip must be otherwise idle — the axon pool claim is exclusive):
    python tools/pregen_ns_tpu.py --probe            # FFT support + 1-batch timing
    python tools/pregen_ns_tpu.py --group test --count 512
    python tools/pregen_ns_tpu.py --group train --count 8192 [--start 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def probe(split_fft: bool = False, batch: int = 16) -> bool:
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()} split_fft={split_fft}", flush=True)
    if not split_fft:
        x = np.random.RandomState(0).randn(2, 64, 64).astype(np.float32)
        try:
            xh = jnp.fft.fftn(jnp.asarray(x), axes=(-2, -1))
            back = jnp.fft.ifftn(xh, axes=(-2, -1)).real
            err = float(jnp.max(jnp.abs(back - x)))
        except Exception as e:
            print(f"complex FFT FAILED on this backend: {e!r}")
            print("retry with --split-fft (matmul-DFT path, no complex dtypes)")
            return False
        print(f"complex FFT roundtrip max err: {err:.2e}")
        if err > 1e-3:
            print("FFT numerically unusable")
            return False

    from enf_pde_tpu.data.navier_stokes import generate_ns_trajectories

    ids = np.arange(1_000_000, 1_000_000 + batch)  # throwaway ids, not cached
    t0 = time.time()
    out = generate_ns_trajectories(ids, t_horizon=20, split_fft=split_fft)
    out = np.asarray(out)
    dt = time.time() - t0
    print(f"{batch}-traj batch: {dt:.1f} s (compile incl.), shape {out.shape}, "
          f"finite={np.isfinite(out).all()}", flush=True)
    # Physics sanity on the probe output: zero-mean vorticity, bounded amplitude.
    print(f"  |mean|={np.abs(out.mean(axis=(1, 2, 3, 4))).max():.2e} "
          f"max|w|={np.abs(out).max():.2f} std={out.std():.3f}", flush=True)
    t0 = time.time()
    out2 = np.asarray(generate_ns_trajectories(ids + batch, t_horizon=20, split_fft=split_fft))
    dt2 = time.time() - t0
    print(f"{batch}-traj batch warm: {dt2:.1f} s -> {dt2 / batch:.2f} s/traj")
    return bool(np.isfinite(out).all() and np.isfinite(out2).all())


def generate(group: str, count: int, start: int, batch: int, split_fft: bool = False) -> None:
    from enf_pde_tpu.data.cache import TrajectoryCache, test_seed
    from enf_pde_tpu.data.navier_stokes import generate_ns_trajectories

    gen = (
        (lambda ids: generate_ns_trajectories(ids, t_horizon=20, split_fft=split_fft))
        if group == "train"
        else (
            lambda ids: generate_ns_trajectories(
                np.asarray([test_seed(i) for i in ids]), t_horizon=20, split_fft=split_fft
            )
        )
    )
    cache = TrajectoryCache(
        os.path.join("data", "navier_stokes", group), gen, batch_size_gen=batch
    )
    cache._force_subprocess = False  # deliberate: generate in-process on the TPU
    todo = [i for i in range(start, start + count) if not os.path.exists(cache._path(i))]
    print(f"{group}: {len(todo)} of {count} to generate (batch {batch})", flush=True)
    t0 = time.time()
    for k in range(0, len(todo), batch):
        blk = np.asarray(todo[k : k + batch])
        cache.ensure(blk)
        rate = (k + len(blk)) / max(time.time() - t0, 1e-9)
        print(f"  {group} {k + len(blk)}/{len(todo)} ({rate:.1f} traj/s)", flush=True)
    print(f"{group} done in {time.time() - t0:.0f} s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--group", choices=["train", "test"])
    ap.add_argument("--count", type=int, default=512)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--split-fft", action="store_true",
                    help="matmul-DFT solver path (no complex dtypes; works on axon TPU)")
    args = ap.parse_args()
    if args.probe:
        ok = probe(split_fft=args.split_fft)
        sys.exit(0 if ok else 1)
    if not args.group:
        ap.error("--group required unless --probe")
    generate(args.group, args.count, args.start, args.batch, split_fft=args.split_fft)
