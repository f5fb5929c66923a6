"""Latent point-set parameterizations (autodecoders) as plain parameter pytrees.

The reference wraps per-signal latent tables in flax modules
(``enf/latents/autodecoder.py``, ``autodecoder_meta.py``); here latents are plain
dicts ``{'p_pos', ['p_ori'], 'a', 'gaussian_window'}`` manipulated with pure
functions — the natural representation for the meta-SGD inner loop (a ``lax.scan``
over SGD updates of exactly this pytree) and for sharding (every leaf is
batch-leading).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from enf_pde_tpu.geometry.latent_init import (
    default_gaussian_window_size,
    init_orientations_grid,
    init_positions_ball,
    init_positions_grid,
    init_positions_polar,
)

__all__ = [
    "init_latents",
    "latents_to_pose",
    "gather_latents",
    "tile_latents",
    "LatentParams",
]

LatentParams = Dict[str, jnp.ndarray]


def init_latents(
    num_signals: int,
    num_latents: int,
    latent_dim: int,
    num_pos_dims: int,
    num_ori_dims: int,
    coordinate_system: str = "cartesian",
    gaussian_window_size: Optional[float] = None,
) -> LatentParams:
    """Create the latent parameter pytree for ``num_signals`` signals.

    Positions are deterministic per coordinate system (grid / polar / Fibonacci ball),
    contexts start at ones, and the Gaussian window size defaults to the latent
    spacing (reference ``autodecoder.py:20-56``).

    Args:
        gaussian_window_size: explicit initial window size; ``None`` / negative uses
            the per-geometry default.
    """
    if coordinate_system == "cartesian":
        p_pos = init_positions_grid(num_signals, num_latents, num_pos_dims)
    elif coordinate_system == "polar":
        p_pos = init_positions_polar(num_signals, num_latents, num_pos_dims)
    elif coordinate_system == "ball":
        p_pos = init_positions_ball(num_signals, num_latents, num_pos_dims)
    else:
        raise ValueError(f"Unknown coordinate system: {coordinate_system!r}")

    params: LatentParams = {"p_pos": p_pos}

    if num_ori_dims > 0:
        if num_pos_dims != 2:
            raise ValueError("Orientation latents are only supported in 2D.")
        params["p_ori"] = init_orientations_grid(num_signals, num_latents)

    params["a"] = jnp.ones((num_signals, num_latents, latent_dim))

    if gaussian_window_size is None or gaussian_window_size <= 0:
        window = default_gaussian_window_size(coordinate_system, num_latents, num_pos_dims)
    else:
        window = float(gaussian_window_size)
    params["gaussian_window"] = jnp.full((num_signals, num_latents, 1), window)
    return params


def latents_to_pose(params: LatentParams) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble (p, a, gaussian_window) from the latent parameter pytree."""
    if "p_ori" in params:
        p = jnp.concatenate([params["p_pos"], params["p_ori"]], axis=-1)
    else:
        p = params["p_pos"]
    return p, params["a"], params["gaussian_window"]


def gather_latents(params: LatentParams, idx: jnp.ndarray) -> LatentParams:
    """Select per-signal latents by trajectory index (autodecoding path)."""
    return {k: v[idx] for k, v in params.items()}


def tile_latents(params: LatentParams, batch_size: int) -> LatentParams:
    """Broadcast shared (num_signals=1) meta latents over a batch (meta-SGD path)."""
    return {k: jnp.repeat(v, batch_size, axis=0) for k, v in params.items()}
