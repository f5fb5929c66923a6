"""Trajectory pre-generation CLI (analogue of the reference's ``gen_navier_stokes.py``).

    python -m enf_pde_tpu.data.generate navier_stokes --path data/ --group train --count 256
    python -m enf_pde_tpu.data.generate shallow_water --path data/ --group test --ids 0,1,2

Writes ``<path>/<cache_name>/<group>/traj_XXXXXX.npz`` files compatible with
``TrajectoryCache``. Also serves as the CPU-subprocess fallback when the active
accelerator backend cannot run a solver op (invoked by ``cache.TrajectoryCache``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    # Force CPU before JAX initializes when invoked as the generation fallback.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from enf_pde_tpu.config import Config
    from enf_pde_tpu.data.registry import DATASET_NAMES, dataset_spec

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", choices=DATASET_NAMES)
    parser.add_argument("--path", default="data/")
    parser.add_argument("--group", choices=("train", "test"), default="train")
    parser.add_argument("--count", type=int, default=None, help="generate ids [0, count)")
    parser.add_argument("--ids", default=None, help="comma-separated trajectory ids")
    parser.add_argument("--dataset-cfg", default=None, help="JSON dataset config (internal)")
    args = parser.parse_args(argv)

    if args.dataset_cfg:
        dcfg = Config(json.loads(args.dataset_cfg))
    else:
        dcfg = Config(
            {"name": args.dataset, "path": args.path, "traj_len_train": 10, "traj_len_out_horizon": 50}
        )
    spec = dataset_spec(args.dataset, dcfg)

    if args.ids:
        ids = np.asarray([int(i) for i in args.ids.split(",")])
    elif args.count:
        ids = np.arange(args.count)
    else:
        parser.error("one of --count / --ids is required")

    out_dir = os.path.join(args.path, spec.cache_name, args.group)
    os.makedirs(out_dir, exist_ok=True)
    gen = spec.gen_train if args.group == "train" else spec.gen_test

    for start in range(0, len(ids), spec.batch_size_gen):
        chunk = ids[start : start + spec.batch_size_gen]
        missing = [
            i for i in chunk if not os.path.exists(os.path.join(out_dir, f"traj_{i:06d}.npz"))
        ]
        if not missing:
            continue
        block = gen(np.asarray(missing))
        os.makedirs(out_dir, exist_ok=True)  # re-assert; cheap and race-proof
        for i, traj in zip(missing, block):
            path = os.path.join(out_dir, f"traj_{i:06d}.npz")
            arr = np.asarray(traj, dtype=np.float32)
            np.savez_compressed(path + ".tmp.npz", data=arr)
            os.replace(path + ".tmp.npz", path)
            arr.tofile(path[:-4] + ".raw.tmp")
            os.replace(path[:-4] + ".raw.tmp", path[:-4] + ".raw")
        meta = os.path.join(out_dir, "shape.json")
        if not os.path.exists(meta):
            with open(meta, "w") as f:
                json.dump(list(np.asarray(block[0]).shape), f)
        print(f"[generate] {args.dataset}/{args.group}: wrote {len(missing)} trajectories")


if __name__ == "__main__":
    main()
