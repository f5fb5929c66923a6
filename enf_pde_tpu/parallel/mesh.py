"""Device mesh + GSPMD sharding layer (new first-class component; see SURVEY.md §5).

The reference is single-device (no pmap/pjit/collectives anywhere). Here scaling works
through ``jax.sharding``:

- **Training**: a 1D ``('data',)`` mesh. Batches (and everything derived from them —
  inner-loop latents, rollouts, per-frame decodes) are sharded over 'data'; parameters
  and optimizer states are replicated. jit + GSPMD inserts the gradient all-reduce
  over ICI automatically.
- **Decoding**: for full-field / super-resolution decode, the coordinate axis is the
  large one (up to ~27k points), and softmax normalizes over *latents*, so coordinate
  tiles are embarrassingly parallel: ``sharded_decode`` shards coordinates over the
  whole mesh with zero cross-chip communication until the final gather.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "shard_train_step",
    "sharded_decode",
]


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """A 1D mesh over the first ``num_devices`` devices (all by default)."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch on the mesh, sharded over its leading axis."""
    sharding = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def shard_train_step(step_fn: Callable, mesh: Mesh, axis_name: str = "data") -> Callable:
    """Jit a ``(state, batch) -> (loss, state)`` step for data-parallel execution.

    State (params + optimizer) is replicated; the batch is sharded over ``axis_name``.
    XLA partitions the per-example compute and inserts the psum over gradients.
    """
    repl = replicate(mesh)
    batch_shard = data_sharding(mesh, axis_name)
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shard),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def sharded_decode(
    apply_fn: Callable,
    mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """Full-field decode with the *coordinate* axis sharded across the mesh.

    Use for zero-shot super-resolution / full-grid rollout decoding where the
    coordinate count dominates: each chip decodes its coordinate shard independently
    (softmax is over latents, so no cross-chip reduction), and only the output gather
    crosses ICI.

    Returns ``decode(params, coords [b, N, d], p, a, window) -> [b, N, C]``; N must be
    divisible by the mesh size.
    """
    repl = replicate(mesh)
    coord_shard = NamedSharding(mesh, P(None, axis_name, None))

    @partial(
        jax.jit,
        in_shardings=(repl, coord_shard, repl, repl, repl),
        out_shardings=coord_shard,
    )
    def decode(params, coords, p, a, window):
        return apply_fn(params, coords, p, a, window)

    return decode
