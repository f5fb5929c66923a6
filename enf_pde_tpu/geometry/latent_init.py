"""Deterministic latent-pose initializers per coordinate system.

Parity with reference ``enf/latents/utils.py``: cartesian grid (requires
``num_latents = k**num_dims``), polar grid with doubled longitude resolution,
Fibonacci-lattice Euler angles on the ball (fixed radius 0.75), and the
rotation-covariant orientation init ``arctan2(x, y)``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "init_positions_grid",
    "init_positions_polar",
    "init_positions_ball",
    "init_orientations_grid",
    "default_gaussian_window_size",
]


def _latents_per_dim(num_latents: int, num_dims: int) -> int:
    per_dim = round(num_latents ** (1.0 / num_dims), 5)
    if abs(per_dim % 1) > 1e-5:
        raise ValueError(
            f"num_latents ({num_latents}) must be a perfect {num_dims}-th power for grid init."
        )
    return int(round(per_dim))


def init_positions_grid(num_signals: int, num_latents: int, num_dims: int) -> jnp.ndarray:
    """Uniform grid over [-1, 1]^d, cell-centered. Returns [num_signals, num_latents, d]."""
    k = _latents_per_dim(num_latents, num_dims)
    axis = jnp.linspace(-1 + 1 / k, 1 - 1 / k, k)
    grids = jnp.meshgrid(*([axis] * num_dims), indexing="ij")
    pos = jnp.stack(grids, axis=-1).reshape(-1, num_dims)
    return jnp.repeat(pos[None], num_signals, axis=0)


def init_positions_polar(num_signals: int, num_latents: int, num_dims: int) -> jnp.ndarray:
    """Spherical (phi, theta) grid with 2x longitudinal resolution.

    ``num_latents`` must be ``2 * k**2``. Returns [num_signals, num_latents, 2].
    """
    k = _latents_per_dim(num_latents // 2, num_dims)
    grid_phi = jnp.linspace(
        jnp.pi / (2 * k), 2 * jnp.pi - jnp.pi / (2 * k), 2 * k
    )
    grid_theta = jnp.linspace((jnp.pi / 2) / k, jnp.pi - (jnp.pi / 2) / k, k)
    grids = jnp.meshgrid(grid_phi, grid_theta, indexing="ij")
    pos = jnp.stack(grids, axis=-1).reshape(-1, num_dims)
    return jnp.repeat(pos[None], num_signals, axis=0)


def init_positions_ball(num_signals: int, num_latents: int, num_dims: int) -> jnp.ndarray:
    """Fibonacci-lattice Euler angles + linear roll, fixed radius 0.75.

    Returns [num_signals, num_latents, 4] with columns (alpha, beta, gamma, r).
    """
    idx = jnp.arange(1, num_latents + 1)
    alpha = jnp.arccos(1 - 2 * idx / (num_latents + 1))
    beta = jnp.pi * (1 + 5**0.5) * idx
    gamma = jnp.arange(0, 2 * jnp.pi, 2 * jnp.pi / num_latents)
    pos = jnp.stack([alpha, beta, gamma], axis=-1).reshape(-1, 3)
    pos = jnp.concatenate([pos, jnp.full((pos.shape[0], 1), 0.75)], axis=-1)
    return jnp.repeat(pos[None], num_signals, axis=0)


def init_orientations_grid(num_signals: int, num_latents: int) -> jnp.ndarray:
    """Rotation-covariant single-orientation init: arctan2 of the grid position.

    Returns [num_signals, num_latents, 1].
    """
    pos = init_positions_grid(num_signals, num_latents, 2)
    return jnp.arctan2(pos[:, :, 0], pos[:, :, 1])[:, :, None]


def default_gaussian_window_size(coordinate_system: str, num_latents: int, num_pos_dims: int) -> float:
    """Initial per-latent Gaussian window std such that neighbouring windows overlap.

    Parity with reference ``enf/latents/autodecoder.py:36-54``.
    """
    if coordinate_system == "cartesian":
        k = _latents_per_dim(num_latents, num_pos_dims)
        return num_pos_dims / k
    if coordinate_system == "polar":
        k = _latents_per_dim(num_latents // 2, num_pos_dims)
        return float(num_pos_dims * jnp.pi / k)
    if coordinate_system == "ball":
        return 1.0
    raise ValueError(f"Unknown coordinate system: {coordinate_system!r}")
